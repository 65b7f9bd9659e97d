"""Shared model building blocks: window attention layer, transformer block,
window trunk, geometry resolution.

Parity targets are the reference's WindowAttention / WindowTransformerBlock
(models/WindowTransformer/model.py:63-170) and the token-grid pad/partition/
reverse/unpad dance (models/FastTransformer/model.py:272-297). All shape
logic here is static Python executed at trace time — every distinct
(input geometry, scale) pair compiles once and is cached by jit.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformerupscaler_tpu.ops.attention import window_attention
from transformerupscaler_tpu.ops.windows import window_partition, window_reverse

# Explicit-parameter initializers (params stay fp32; compute dtype is cast at use).
_dense_init = nn.initializers.lecun_normal()
_bias_init = nn.initializers.zeros
_table_init = nn.initializers.truncated_normal(stddev=0.02)


def resolve_geometry(in_hw: tuple[int, int], res_out, upscale_factor):
    """Reference FastTransformer/model.py:244-248: ``upscale_factor`` wins and
    redefines res_out; otherwise scale = ceil(max(res_out / in))."""
    h, w = in_hw
    if upscale_factor is not None:
        res_out = (h * upscale_factor, w * upscale_factor)
    else:
        upscale_factor = math.ceil(max(res_out[0] / h, res_out[1] / w))
    return tuple(res_out), int(upscale_factor)


class DenseParams(nn.Module):
    """Dense layer with eagerly-declared params (setup), so serving paths can
    read the raw kernel (e.g. for int8 quantization) without a call. Param
    tree matches nn.Dense: {kernel, bias}."""

    in_features: int
    out_features: int

    def setup(self):
        self.kernel = self.param("kernel", _dense_init,
                                 (self.in_features, self.out_features))
        self.bias = self.param("bias", _bias_init, (self.out_features,))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.einsum("...c,cd->...d", x, self.kernel.astype(x.dtype))
        return y + self.bias.astype(x.dtype)


class ConvLayer(nn.Module):
    """3x3-style conv with explicit HWIO kernel param (torch ``padding=1``
    output semantics via explicit padding)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    relu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from transformerupscaler_tpu.ops.conv import conv2d

        k = self.param(
            "kernel", _dense_init,
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features))
        b = self.param("bias", _bias_init, (self.features,)) if self.use_bias else None
        return conv2d(x.astype(self.dtype), k, b, stride=self.stride,
                      padding=self.padding, relu=self.relu)


class WindowAttentionLayer(nn.Module):
    """Window MSA with relative position bias; raw params so the same weights
    feed either the XLA or the fused Pallas implementation."""

    dim: int
    window_size: int
    num_heads: int
    dropout: float = 0.0
    impl: str = "xla"
    calib_int8: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d = self.dim
        qkv_w = self.param("qkv_kernel", _dense_init, (d, 3 * d))
        qkv_b = self.param("qkv_bias", _bias_init, (3 * d,))
        proj_w = self.param("proj_kernel", _dense_init, (d, d))
        proj_b = self.param("proj_bias", _bias_init, (d,))
        table = self.param(
            "bias_table", _table_init,
            ((2 * self.window_size - 1) ** 2, self.num_heads),
        )
        if self.calib_int8 and not self.is_initializing():
            # proj's input (softmax-weighted V) is a per-head convex
            # combination of v rows, so per-channel max|v| bounds it —
            # harvested with one calibration-only GEMM.
            qkv = (x.astype(self.dtype) @ qkv_w.astype(self.dtype)
                   + qkv_b).astype(jnp.float32)
            v = qkv[..., 2 * d:3 * d]
            red = tuple(range(v.ndim - 1))
            self.sow("intermediates", "trunk_i8_proj",
                     jnp.max(jnp.abs(v), axis=red))
        rng = None
        if not deterministic and self.dropout > 0.0:
            rng = self.make_rng("dropout")
        return window_attention(
            x.astype(self.dtype), qkv_w.astype(self.dtype), qkv_b, proj_w.astype(self.dtype),
            proj_b, table, num_heads=self.num_heads, window_size=self.window_size,
            dropout_rate=self.dropout, deterministic=deterministic, rng=rng,
            impl=self.impl,
        )


class WindowBlock(nn.Module):
    """Pre-LN attention + pre-LN 4x GELU MLP with residuals.

    Parity: reference WindowTransformerBlock (WindowTransformer/model.py:133-170)
    — LayerNorm eps 1e-5 and exact (erf) GELU to match torch defaults.
    """

    dim: int
    window_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    impl: str = "xla"
    int8_mlp: bool = False
    # Calibration-only: sow per-channel |max| of the four GEMM inputs
    # (trunk_i8_{qkv,proj,fc1,fc2}) for the int8 fused2-trunk scales.
    calib_trunk_int8: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hidden = int(self.dim * self.mlp_ratio)
        self.attn = WindowAttentionLayer(
            self.dim, self.window_size, self.num_heads, self.dropout,
            impl=self.impl, calib_int8=self.calib_trunk_int8,
            dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.mlp_fc1 = DenseParams(self.dim, hidden)
        self.mlp_fc2 = DenseParams(hidden, self.dim)
        self.mlp_drop = nn.Dropout(self.dropout)

    def _sow_max(self, name, v):
        red = tuple(range(v.ndim - 1))
        self.sow("intermediates", name,
                 jnp.max(jnp.abs(v.astype(jnp.float32)), axis=red))

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        calib = self.calib_trunk_int8 and not self.is_initializing()
        y_in = self.norm1(x)
        if calib:
            self._sow_max("trunk_i8_qkv", y_in)
        x = x + self.attn(y_in, deterministic=deterministic)
        z = self.norm2(x)
        if calib:
            self._sow_max("trunk_i8_fc1", z)
        if self.int8_mlp and deterministic:
            # True int8 MXU path: per-output-channel weight quant + dynamic
            # per-tensor activation quant (serving only).
            from transformerupscaler_tpu.ops.quant import (
                int8_dense,
                quantize_weight,
            )

            q1, s1 = quantize_weight(self.mlp_fc1.kernel)
            q2, s2 = quantize_weight(self.mlp_fc2.kernel)
            y = int8_dense(z, q1, s1, self.mlp_fc1.bias)
            y = jax.nn.gelu(y, approximate=False)
            y = int8_dense(y, q2, s2, self.mlp_fc2.bias)
        else:
            h1 = jax.nn.gelu(self.mlp_fc1(z), approximate=False)
            if calib:
                self._sow_max("trunk_i8_fc2", h1)
            y = self.mlp_fc2(h1)
        y = self.mlp_drop(y, deterministic=deterministic)
        return x + y


def run_window_trunk(tokens: jnp.ndarray, blocks, window_size: int,
                     deterministic: bool = True,
                     int8_acts=None) -> jnp.ndarray:
    """tokens: (B, Ht, Wt, D) -> same shape, after zero-padding the grid to a
    window multiple, windowed attention blocks, and unpadding.

    int8_acts: optional per-layer activation scales (see
    ops/pallas/trunk2.fused_window_trunk_v2) — routes the fused2 trunk's
    four GEMMs through int8 MXU dots. Ignored on the XLA path.

    Parity: reference FastTransformer/model.py:272-297.
    """
    b, ht, wt, d = tokens.shape
    ws = window_size
    pad_b = (ws - ht % ws) % ws
    pad_r = (ws - wt % ws) % ws
    if pad_b or pad_r:
        tokens = jnp.pad(tokens, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = ht + pad_b, wt + pad_r

    win = window_partition(tokens, ws)  # (B, nW, ws*ws, D)
    n_win = win.shape[1]
    win = win.reshape(b * n_win, ws * ws, d)
    first = blocks[0]
    if (first.impl in ("fused", "fused2") and deterministic
            and not first.is_initializing()):
        # Whole-trunk Pallas megakernel: all blocks run VMEM-resident per
        # window group. Serving only — dropout and param init go through
        # the reference path below. "fused2" is the static-unroll rewrite
        # (ops/pallas/trunk2.py; measured v5e @720p: 2.56 ms vs 2.85 XLA
        # vs 3.34 v1 — the first fused-trunk win).
        params = [blk.variables["params"] for blk in blocks]
        if first.impl == "fused2":
            from transformerupscaler_tpu.ops.pallas.trunk2 import (
                fused_window_trunk_v2,
            )

            win = fused_window_trunk_v2(win, params, first.num_heads, ws,
                                        int8_acts=int8_acts)
        else:
            from transformerupscaler_tpu.ops.pallas.trunk import (
                fused_window_trunk,
            )

            win = fused_window_trunk(win, params, num_heads=first.num_heads,
                                     window_size=ws)
    else:
        for block in blocks:
            win = block(win, deterministic=deterministic)
    win = win.reshape(b, n_win, ws * ws, d)
    tokens = window_reverse(win, ws, hp, wp)
    if pad_b or pad_r:
        tokens = tokens[:, :ht, :wt, :]
    return tokens
