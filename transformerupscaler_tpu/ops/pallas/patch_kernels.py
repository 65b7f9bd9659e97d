"""Pallas patch embed / unembed(+skip-add) kernels.

The XLA reshape-GEMM patch embed (ops/patch.py) costs ~2.9 ms in the 720p
serving graph for a 22.6 GF GEMM because the (B,H,W,C) -> (B,Ht,Wt,ps*ps*C)
patch transpose rewrites the 118 MB feature map through HBM with tiny minor
dims (~140 GB/s effective). These kernels never materialize patches: the
feature map is viewed as (Ht, ps, Wt, 4, 128) — a pure bitcast of NHWC for
C=64, ps=8, since one token row of one pixel row is exactly 8*64 = 4x128
lanes — and each (pixel-row i, lane-group g) contributes one dense K=128
matmul. 32 matmuls of (Wt,128)x(128,D) per token row, zero layout traffic.

The unembed kernel additionally fuses the residual skip-add
(reference FastTransformer/model.py:308-309): combined = feat + unembed(tok)
is written in one pass, saving a separate 354 MB elementwise-add stage
(~1.9 ms measured).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PS = 8
_C = 64
_G = _PS * _C // 128  # lane groups per pixel row of a token (= 4)


def _supported(c: int, ps: int) -> bool:
    return c == _C and ps == _PS


def _embed_kernel(feat_ref, w_ref, b_ref, out_ref):
    # feat_ref: (1, k, ps, Wt, G, 128); w_ref: (ps, G, 128, D);
    # b_ref: (1, D); out_ref: (1, k, Wt, D)
    k, wt, d = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    for t in range(k):
        acc = jnp.zeros((wt, d), jnp.float32)
        for i in range(_PS):
            for g in range(_G):
                acc = acc + jnp.dot(feat_ref[0, t, i, :, g, :], w_ref[i, g],
                                    preferred_element_type=jnp.float32)
        acc = acc + b_ref[0:1, :].astype(jnp.float32)
        out_ref[0, t] = acc.astype(out_ref.dtype)


def fused_patch_embed(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias: jnp.ndarray | None, token_rows_per_cell: int = 2,
                      interpret: bool | None = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/ps, W/ps, D); drop-in for ops.patch.patch_embed."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ps = kernel.shape[0]
    b, h, w, c = x.shape
    d = kernel.shape[-1]
    ht, wt = h // ps, w // ps
    dt = x.dtype
    k = token_rows_per_cell
    while ht % k:
        k -= 1

    # (ps, ps, C, D) -> (ps, G, 128, D): lane l = px*C + ch, pixel j = 2g+px.
    wmat = kernel.reshape(ps, _G, 2, c, d).transpose(0, 1, 2, 3, 4)
    wmat = wmat.reshape(ps, _G, 2 * c, d).astype(dt)
    bvec = (bias if bias is not None else jnp.zeros((d,))).reshape(1, d)

    feat = x.reshape(b, ht, ps, wt, _G, 128)
    out = pl.pallas_call(
        _embed_kernel,
        grid=(b, ht // k),
        in_specs=[
            pl.BlockSpec((1, k, ps, wt, _G, 128),
                         lambda nb, i: (nb, i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ps, _G, 2 * c, d), lambda nb, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda nb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, wt, d), lambda nb, i: (nb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ht, wt, d), dt),
        interpret=interpret,
    )(feat, wmat, bvec.astype(dt))
    return out


def _unembed_kernel(tok_ref, feat_ref, w_ref, b_ref, out_ref):
    # tok_ref: (1, k, Wt, D); feat_ref/out_ref: (1, k, ps, Wt, G, 128);
    # w_ref: (ps, G, D, 128); b_ref: (1, 128)
    k = tok_ref.shape[1]
    dt = out_ref.dtype
    for t in range(k):
        tokens = tok_ref[0, t]  # (Wt, D)
        for i in range(_PS):
            for g in range(_G):
                y = jnp.dot(tokens, w_ref[i, g],
                            preferred_element_type=jnp.float32).astype(dt)
                out_ref[0, t, i, :, g, :] = (
                    y + b_ref[0:1, :] + feat_ref[0, t, i, :, g, :])


def fused_patch_unembed_add(tokens: jnp.ndarray, feat: jnp.ndarray,
                            kernel: jnp.ndarray, bias: jnp.ndarray | None,
                            token_rows_per_cell: int = 2,
                            interpret: bool | None = None) -> jnp.ndarray:
    """``patch_unembed(tokens) + feat`` in one HBM pass.

    tokens: (B, Ht, Wt, D); feat: (B, Ht*ps, Wt*ps, C); kernel (D, ps, ps, C).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d, ps, _, c = kernel.shape
    b, ht, wt, _ = tokens.shape
    dt = tokens.dtype
    k = token_rows_per_cell
    while ht % k:
        k -= 1

    # (D, ps, ps, C) -> (ps, G, D, 128)
    wmat = kernel.reshape(d, ps, _G, 2 * c).transpose(1, 2, 0, 3).astype(dt)
    bv = (bias if bias is not None else jnp.zeros((c,)))
    bv = jnp.tile(bv.reshape(1, c), (1, 2)).astype(dt)  # (1, 128)

    featv = feat.reshape(b, ht, ps, wt, _G, 128)
    out = pl.pallas_call(
        _unembed_kernel,
        grid=(b, ht // k),
        in_specs=[
            pl.BlockSpec((1, k, wt, d), lambda nb, i: (nb, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, ps, wt, _G, 128),
                         lambda nb, i: (nb, i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ps, _G, d, 2 * c), lambda nb, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda nb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, ps, wt, _G, 128),
                               lambda nb, i: (nb, i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ht, ps, wt, _G, 128), dt),
        interpret=interpret,
    )(tokens, featv, wmat, bv)
    return out.reshape(b, ht * ps, wt * ps, c)
