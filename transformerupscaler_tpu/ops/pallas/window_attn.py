"""Fused window-attention Pallas kernel.

Replaces the eager per-head attention of the reference WindowAttention
(models/WindowTransformer/model.py:104-133) on TPU. Design notes:

- Window partitioning is folded into the LAYOUT, not materialized: tokens
  arrive as (B*num_windows, N, C); the kernel sees q/k/v transposed to
  (C, T) with the token axis on lanes, and each grid cell owns one window's
  N-token slab. Scores, relative-position bias add, softmax, and the context
  matmul all stay in VMEM — the (N, N) f32 score matrices never touch HBM.
- head_dim is 16, far below the 128-lane MXU tile, so heads are sliced on
  the SUBLANE axis (channels), where 16 is tile-aligned for every dtype;
  the per-head matmuls contract over sublanes. The context product is
  computed directly in (hd, N) orientation so no in-kernel transpose is
  needed.
- The qkv and output projections stay outside the kernel — they are large
  dense GEMMs that XLA already runs near peak.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformerupscaler_tpu.ops.relpos import gather_relative_bias


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, num_heads):
    """One window per cell.

    q_ref/k_ref/v_ref: (1, C, N) — channel-major, lane dim = tokens.
    bias_ref: (num_heads, N, N) f32 relative-position bias.
    out_ref: (1, C, N).
    """
    c = q_ref.shape[1]
    hd = c // num_heads
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        q = q_ref[0, sl, :]  # (hd, N)
        k = k_ref[0, sl, :]
        v = v_ref[0, sl, :]
        # scores[s, t] = sum_d q[d, s] * k[d, t]
        scores = jax.lax.dot_general(
            q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        scores = scores + bias_ref[h]
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        # out[d, s] = sum_t v[d, t] * p[s, t]
        out = jax.lax.dot_general(
            v, p.astype(v.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, sl, :] = out.astype(out_ref.dtype)


def fused_window_attention(x, qkv_w, qkv_b, proj_w, proj_b, bias_table,
                           num_heads, window_size, interpret: bool = False):
    """Drop-in for ops.attention.window_attention (deterministic path).

    x: (B, N, C) with B = batch*num_windows, N = window_size**2.
    """
    b, n, c = x.shape
    hd = c // num_heads
    dtype = x.dtype

    qkv = jnp.einsum("bnc,cd->bnd", x, qkv_w.astype(dtype)) + qkv_b.astype(dtype)
    # (B, N, 3C) -> (3, B, C, N): channel-major with tokens on lanes.
    qkv = qkv.reshape(b, n, 3, c).transpose(2, 0, 3, 1)
    scale = jnp.asarray(hd ** -0.5, dtype)
    q, k, v = qkv[0] * scale, qkv[1], qkv[2]  # (B, C, N)

    bias = gather_relative_bias(bias_table.astype(jnp.float32), window_size)
    # (H, N, N) f32

    out = pl.pallas_call(
        lambda qr, kr, vr, br, orf: _attn_kernel(qr, kr, vr, br, orf,
                                                 num_heads=num_heads),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, n), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, n, n), lambda w: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, n), lambda w: (w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, n), dtype),
        interpret=interpret,
    )(q, k, v, bias)

    # (B, C, N) -> (B, N, C)
    out = out.transpose(0, 2, 1)
    out = jnp.einsum("bnc,cd->bnd", out, proj_w.astype(dtype)) + proj_b.astype(dtype)
    return out
