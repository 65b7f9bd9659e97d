"""Blocked global multi-head attention — the ResidualTransformer hot path.

The reference ResidualTransformer runs 8 blocks of GLOBAL
``nn.MultiheadAttention`` over 3600 tokens (models/ResidualTransformer/
model.py:31,93-105). XLA materializes every block's (heads, 3600, 3600)
score/probability tensors in HBM (~0.4 GB f32 per block per direction) —
pure bandwidth, nothing else in the model comes close.

This kernel never lets scores leave VMEM: each grid cell owns one q-row
block and computes its FULL score row strip (heads*qb, Np) against all
keys, softmaxes it in-register, and contracts with V — one pass, no
running-max bookkeeping needed because the whole strip fits in VMEM at
qb = 64 (8 heads: (512, 3712) f32 = 7.6 MB).

Head handling uses the trunk kernels' block-diagonal mask algebra
(ops/pallas/trunk.py:_head_mask): all-head scores as ONE
(heads*qb, C) x (C, Np) MXU product. The head_dim-16 contraction wastes
MXU depth either way (16 < 128 lanes), so the mask inflation costs no
extra MXU passes over a per-head loop and keeps every dot large.

Numerics match ops/attention.multihead_attention: bf16 q-scaling, f32
scores and softmax, probabilities cast back to the compute dtype before
the context dot. Serving-only (no VJP, no dropout).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformerupscaler_tpu.ops.pallas.trunk import _head_mask


def _gmha_kernel(q_ref, k_ref, v_ref, hmask_ref, kmask_ref, out_ref, *,
                 heads, qb):
    c = q_ref.shape[-1]
    dt = out_ref.dtype
    hmask = hmask_ref[:]  # (heads*qb, c) compute dtype
    qp = (jnp.broadcast_to(q_ref[0][None], (heads, qb, c))
          .reshape(heads * qb, c) * hmask)
    s = jax.lax.dot_general(qp, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + kmask_ref[0:1, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
    ctx = jnp.dot(p, v_ref[0], preferred_element_type=jnp.float32)
    # Block-diagonal extraction: each output channel belongs to exactly one
    # head, so the masked head-sum is exact (trunk2 ctxs logic).
    ctx = jnp.sum((ctx * hmask.astype(jnp.float32))
                  .reshape(heads, qb, c), axis=0)
    out_ref[0] = ctx.astype(dt)


def global_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               num_heads: int, qb: int = 64,
               interpret: bool | None = None) -> jnp.ndarray:
    """softmax(q k^T / sqrt(hd)) v over packed-head channels.

    q, k, v: (B, N, C) with head h in channels [h*hd, (h+1)*hd) — the
    layout of ops/attention.multihead_attention's packed qkv. Returns
    (B, N, C). N is padded internally to a multiple of lcm(qb, 128); pad
    keys are masked with -1e9 before the softmax.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, c = q.shape
    dt = q.dtype
    hd = c // num_heads
    step = int(np.lcm(qb, 128))
    np_ = ((n + step - 1) // step) * step
    pad = np_ - n
    if pad:
        zz = ((0, 0), (0, pad), (0, 0))
        q, k, v = jnp.pad(q, zz), jnp.pad(k, zz), jnp.pad(v, zz)
    q = q * jnp.asarray(hd ** -0.5, dt)
    kmask = jnp.concatenate(
        [jnp.zeros((1, n), jnp.float32),
         jnp.full((1, pad), -1e9, jnp.float32)], axis=1)
    hmask = jnp.asarray(_head_mask(num_heads, qb, c), dt)

    out = pl.pallas_call(
        partial(_gmha_kernel, heads=num_heads, qb=qb),
        grid=(b, np_ // qb),
        in_specs=[
            pl.BlockSpec((1, qb, c), lambda nb, i: (nb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, c), lambda nb, i: (nb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, c), lambda nb, i: (nb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(hmask.shape, lambda nb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kmask.shape, lambda nb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, c), lambda nb, i: (nb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, c), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, hmask, kmask)
    return out[:, :n] if pad else out
