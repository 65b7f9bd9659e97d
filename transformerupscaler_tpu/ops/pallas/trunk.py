"""Fused window-transformer trunk: ALL blocks in one Pallas kernel.

Replaces the per-block XLA path of models/common.run_window_trunk for
serving. Rationale (measured on v5e, FastTransformer 720p): the XLA trunk
costs 2.8 ms for ~76 GF of GEMMs (~27 TF/s) because every block boundary
round-trips the 5.9 MB token tensor through HBM at ~140 GB/s effective.
Windows never exchange information (the architecture's scaling trick,
reference WindowTransformer/model.py:29-61), so a grid cell can run the
ENTIRE trunk for its windows with zero cross-cell traffic: tokens are read
once, all L blocks run from VMEM, tokens are written once.

Attention without tiny matmuls: per window, scores for all heads are ONE
(heads*N, C) x (C, N) MXU product using a block-diagonal head mask —
  S[(h,s), t] = sum_c (q_rep * mask)[(h,s), c] * k[t, c]
where q_rep tiles the window's q over heads and mask[(h,s), h*hd+d'] = 1.
The mask inflates MACs by `heads` but keeps every MXU dimension >= 64 and
avoids per-head (.., 16) slicing entirely; attention is ~6% of trunk FLOPs,
so the inflation costs ~zero wall-clock. Context uses the same trick in
reverse: (P @ v) masked and segment-summed over heads.

Numerics match the XLA path: LayerNorm stats in f32 (fast variance, like
flax), f32 scores + softmax, exact (erf) GELU, bf16 GEMM outputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformerupscaler_tpu.ops.relpos import gather_relative_bias


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |error| <= 1.5e-7 — Mosaic
    lowers neither erf nor erfc, and 1.5e-7 is far below bf16 resolution."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """erf-based GELU (torch default, parity target)."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + _erf(xf * (2.0 ** -0.5)))
    return y.astype(x.dtype)


def _layernorm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32))


def _trunk_kernel(x_ref, mask_ref, ln1s, ln1b, qkvw, qkvb, projw, projb,
                  ln2s, ln2b, fc1w, fc1b, fc2w, fc2b, bias_ref, out_ref,
                  attn_scr, qkv_scr, *, layers, heads, n, wpc):
    c = x_ref.shape[-1]
    t = wpc * n
    dt = x_ref.dtype
    scale = jnp.asarray((c // heads) ** -0.5, dt)
    mask = mask_ref[:]  # (heads*n, c)

    x = x_ref[:].reshape(t, c)
    for l in range(layers):
        y = _layernorm(x, ln1s[l], ln1b[l]).astype(dt)
        # staged through a scratch ref: Mosaic supports dynamic (pl.ds)
        # indexing on refs but not dynamic_slice on loop-carried values.
        # All matmuls accumulate in f32 (Mosaic requires 32-bit accs).
        qkv_scr[:] = (jnp.dot(y, qkvw[l], preferred_element_type=jnp.float32)
                      .astype(dt) + qkvb[l])
        bias_l = bias_ref[l]  # (heads*n, n) f32

        def wbody(w, carry, bias_l=bias_l):
            q = qkv_scr[pl.ds(w * n, n), 0:c] * scale
            k = qkv_scr[pl.ds(w * n, n), c:2 * c]
            v = qkv_scr[pl.ds(w * n, n), 2 * c:3 * c]
            qp = jnp.broadcast_to(q[None], (heads, n, c)).reshape(
                heads * n, c) * mask
            s = jax.lax.dot_general(
                qp, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (heads*n, n)
            s = s + bias_l
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(dt), v,
                        preferred_element_type=jnp.float32).astype(dt)
            # extract the block-diagonal: each output element has exactly one
            # nonzero head contribution, so the sum is exact.
            ctx = jnp.sum((o * mask).reshape(heads, n, c), axis=0)
            attn_scr[pl.ds(w * n, n), :] = ctx.astype(dt)
            return carry

        jax.lax.fori_loop(0, wpc, wbody, 0)
        attn = jnp.dot(attn_scr[:], projw[l],
                       preferred_element_type=jnp.float32).astype(dt)
        x = x + attn + projb[l]
        y2 = _layernorm(x, ln2s[l], ln2b[l]).astype(dt)
        h1 = jnp.dot(y2, fc1w[l],
                     preferred_element_type=jnp.float32).astype(dt) + fc1b[l]
        h1 = _gelu_exact(h1)
        x = x + jnp.dot(h1, fc2w[l],
                        preferred_element_type=jnp.float32).astype(dt) + fc2b[l]

    out_ref[:] = x.reshape(wpc, n, c)


def _head_mask(heads: int, n: int, c: int) -> np.ndarray:
    hd = c // heads
    mask = np.zeros((heads * n, c), np.float32)
    for h in range(heads):
        mask[h * n:(h + 1) * n, h * hd:(h + 1) * hd] = 1.0
    return mask


def fused_window_trunk(win: jnp.ndarray, block_params: list[dict],
                       num_heads: int, window_size: int,
                       windows_per_cell: int = 12,
                       interpret: bool | None = None) -> jnp.ndarray:
    """win: (nW, ws*ws, C) window tokens -> same shape after all blocks.

    block_params: per-block dicts with the WindowBlock param tree
    ({attn: {qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table},
      norm1/norm2: {scale, bias}, mlp_fc1/mlp_fc2: {kernel, bias}}).
    """
    if interpret is None:
        # CPU (tests, virtual meshes) runs the kernel interpreted.
        interpret = jax.default_backend() != "tpu"
    nw, n, c = win.shape
    dt = win.dtype
    layers = len(block_params)
    wpc = min(windows_per_cell, nw)
    pad = (wpc - nw % wpc) % wpc
    if pad:
        win = jnp.pad(win, ((0, pad), (0, 0), (0, 0)))

    def stack(path):
        arrs = []
        for p in block_params:
            a = p
            for k in path:
                a = a[k]
            arrs.append(jnp.asarray(a, dt))
        return jnp.stack(arrs)

    ln1s = stack(["norm1", "scale"]).reshape(layers, 1, c)
    ln1b = stack(["norm1", "bias"]).reshape(layers, 1, c)
    qkvw = stack(["attn", "qkv_kernel"])
    qkvb = stack(["attn", "qkv_bias"]).reshape(layers, 1, 3 * c)
    projw = stack(["attn", "proj_kernel"])
    projb = stack(["attn", "proj_bias"]).reshape(layers, 1, c)
    ln2s = stack(["norm2", "scale"]).reshape(layers, 1, c)
    ln2b = stack(["norm2", "bias"]).reshape(layers, 1, c)
    fc1w = stack(["mlp_fc1", "kernel"])
    fc1b = stack(["mlp_fc1", "bias"]).reshape(layers, 1, -1)
    fc2w = stack(["mlp_fc2", "kernel"])
    fc2b = stack(["mlp_fc2", "bias"]).reshape(layers, 1, c)
    bias = jnp.stack([
        gather_relative_bias(
            jnp.asarray(p["attn"]["bias_table"], jnp.float32), window_size
        ).reshape(num_heads * n, n)
        for p in block_params
    ])  # (L, heads*n, n) f32

    mask = jnp.asarray(_head_mask(num_heads, n, c), dt)
    hidden = fc1w.shape[-1]

    grid = ((nw + pad) // wpc,)
    const = lambda i: (0, 0, 0)  # noqa: E731

    def spec3(a):
        return pl.BlockSpec(a.shape, const, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_trunk_kernel, layers=layers, heads=num_heads, n=n, wpc=wpc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wpc, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads * n, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            spec3(ln1s), spec3(ln1b), spec3(qkvw), spec3(qkvb),
            spec3(projw), spec3(projb), spec3(ln2s), spec3(ln2b),
            spec3(fc1w), spec3(fc1b), spec3(fc2w), spec3(fc2b), spec3(bias),
        ],
        out_specs=pl.BlockSpec((wpc, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw + pad, n, c), dt),
        scratch_shapes=[pltpu.VMEM((wpc * n, c), dt),
                        pltpu.VMEM((wpc * n, 3 * c), dt)],
        interpret=interpret,
    )(win, mask, ln1s, ln1b, qkvw, qkvb, projw, projb, ln2s, ln2b,
      fc1w, fc1b, fc2w, fc2b, bias)

    return out[:nw] if pad else out
