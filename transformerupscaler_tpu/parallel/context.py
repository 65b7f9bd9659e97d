"""Trace-time activation-sharding context.

Model code stays mesh-agnostic; wrapping a jit trace in
``activation_sharding(mesh)`` makes the attention ops pin their per-head
tensors to the ``model`` axis via ``with_sharding_constraint``, and GSPMD
propagates the split through the surrounding matmuls (Megatron-style tensor
parallelism over heads — each window's 64x64 attention is tiny, so the win is
splitting the qkv/proj/MLP GEMM work across chips while gradients all-reduce
over ``data``).
"""

import contextlib
import threading

from jax.sharding import NamedSharding, PartitionSpec as P

_state = threading.local()


@contextlib.contextmanager
def activation_sharding(mesh, head_axis: str = "model"):
    prev = getattr(_state, "cfg", None)
    _state.cfg = (mesh, head_axis)
    try:
        yield
    finally:
        _state.cfg = prev


def maybe_shard_heads(x):
    """x: (..., heads, N, hd) — constrain the heads axis (-3) to the model
    mesh axis when an activation_sharding context is active."""
    cfg = getattr(_state, "cfg", None)
    if cfg is None:
        return x
    mesh, axis = cfg
    import jax

    spec = [None] * x.ndim
    spec[-3] = axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
