"""Attention ops: windowed MSA with relative position bias, and global MHA.

Parity targets:
  - WindowAttention (reference models/WindowTransformer/model.py:63-131):
    qkv linear -> per-head scaling -> q@k^T + relative bias -> softmax ->
    (dropout) -> @v -> output projection -> (dropout).
  - nn.MultiheadAttention as used by ResidualTransformer
    (models/ResidualTransformer/model.py:31,44): identical math without the
    bias table, packed in_proj weights.

Weight layout is JAX convention (in_features, out_features); the torch
checkpoint converter transposes ``nn.Linear`` weights.

``impl='xla'`` is the lax/jnp path (XLA fuses it well at these tiny window
sizes); ``impl='pallas'`` routes to the fused Pallas kernel in
ops/pallas/window_attn.py.
"""

import jax
import jax.numpy as jnp

from transformerupscaler_tpu.ops.relpos import gather_relative_bias


def _dropout(x: jnp.ndarray, rate: float, rng, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def window_attention(
    x: jnp.ndarray,
    qkv_w: jnp.ndarray,
    qkv_b: jnp.ndarray,
    proj_w: jnp.ndarray,
    proj_b: jnp.ndarray,
    bias_table: jnp.ndarray,
    num_heads: int,
    window_size: int,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    rng=None,
    impl: str = "xla",
) -> jnp.ndarray:
    """x: (B, N, C) with N == window_size**2 tokens per window."""
    if impl == "pallas" and deterministic:
        from transformerupscaler_tpu.ops.pallas.window_attn import (
            fused_window_attention,
        )
        return fused_window_attention(
            x, qkv_w, qkv_b, proj_w, proj_b, bias_table, num_heads, window_size
        )

    b, n, c = x.shape
    hd = c // num_heads
    qkv = jnp.einsum("bnc,cd->bnd", x, qkv_w.astype(x.dtype)) + qkv_b.astype(x.dtype)
    qkv = qkv.reshape(b, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, hd)
    from transformerupscaler_tpu.parallel.context import maybe_shard_heads

    q, k, v = maybe_shard_heads(q), maybe_shard_heads(k), maybe_shard_heads(v)
    q = q * (hd ** -0.5)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    bias = gather_relative_bias(bias_table.astype(jnp.float32), window_size)
    attn = attn + bias[None]
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    if not deterministic and dropout_rate > 0.0:
        rng, sub = jax.random.split(rng)
        attn = _dropout(attn, dropout_rate, sub, deterministic)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    out = jnp.einsum("bnc,cd->bnd", out, proj_w.astype(x.dtype)) + proj_b.astype(x.dtype)
    if not deterministic and dropout_rate > 0.0:
        _, sub = jax.random.split(rng)
        out = _dropout(out, dropout_rate, sub, deterministic)
    return out


def multihead_attention(
    x: jnp.ndarray,
    in_w: jnp.ndarray,
    in_b: jnp.ndarray,
    out_w: jnp.ndarray,
    out_b: jnp.ndarray,
    num_heads: int,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    rng=None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Self-attention parity with ``nn.MultiheadAttention(batch_first=True)``.

    in_w: (C, 3C) packed q/k/v projection (torch in_proj_weight transposed);
    out_w: (C, C).

    impl != "xla" (serving-only) routes the softmax(qk^T)v core through the
    blocked Pallas kernel (ops/pallas/gmha.py) — at ResidualTransformer's
    3600 global tokens the XLA path materializes ~0.4 GB of scores per
    block in HBM; the kernel keeps them in VMEM.
    """
    b, n, c = x.shape
    if impl != "xla" and deterministic:
        from transformerupscaler_tpu.ops.pallas.gmha import global_mha

        qkv = (jnp.einsum("bnc,cd->bnd", x, in_w.astype(x.dtype))
               + in_b.astype(x.dtype))
        ctx = global_mha(qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:],
                         num_heads)
        return (jnp.einsum("bnc,cd->bnd", ctx, out_w.astype(x.dtype))
                + out_b.astype(x.dtype))
    hd = c // num_heads
    qkv = jnp.einsum("bnc,cd->bnd", x, in_w.astype(x.dtype)) + in_b.astype(x.dtype)
    qkv = qkv.reshape(b, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    from transformerupscaler_tpu.parallel.context import maybe_shard_heads

    q, k, v = maybe_shard_heads(q), maybe_shard_heads(k), maybe_shard_heads(v)
    q = q * (hd ** -0.5)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    if not deterministic and dropout_rate > 0.0:
        rng, sub = jax.random.split(rng)
        attn = _dropout(attn, dropout_rate, sub, deterministic)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    out = jnp.einsum("bnc,cd->bnd", out, out_w.astype(x.dtype)) + out_b.astype(x.dtype)
    return out
