"""Relative position bias machinery for window attention.

Parity: reference models/WindowTransformer/model.py:82-100 — a learned table
of shape ((2*ws-1)^2, num_heads) indexed by a precomputed (ws^2, ws^2) map of
pairwise relative offsets.

TPU-first: the index map is static, so instead of a runtime gather (slow on
TPU) we precompute a one-hot matrix (ws^2*ws^2, (2*ws-1)^2) once on the host
and fetch the bias with a tiny matmul; XLA constant-folds the one-hot and the
result is cached across steps under jit.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def relative_position_index(window_size: int) -> np.ndarray:
    """(ws^2, ws^2) int32 map of pairwise relative-offset table indices."""
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)  # (2, ws*ws)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)  # (N, N, 2)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1).astype(np.int32)


@lru_cache(maxsize=None)
def _one_hot_index(window_size: int) -> np.ndarray:
    ws = window_size
    n = ws * ws
    table_size = (2 * ws - 1) ** 2
    idx = relative_position_index(ws).reshape(-1)
    one_hot = np.zeros((n * n, table_size), dtype=np.float32)
    one_hot[np.arange(n * n), idx] = 1.0
    return one_hot


def gather_relative_bias(table: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """table ((2*ws-1)^2, num_heads) -> bias (num_heads, ws^2, ws^2)."""
    n = window_size * window_size
    one_hot = jnp.asarray(_one_hot_index(window_size), dtype=table.dtype)
    bias = jnp.einsum("pt,th->ph", one_hot, table,
                      preferred_element_type=jnp.float32).astype(table.dtype)
    return bias.reshape(n, n, -1).transpose(2, 0, 1)
