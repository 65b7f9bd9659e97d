"""Device-mesh construction for multi-chip scaling.

The reference is strictly single-device (SURVEY.md §2.9); scaling here is
TPU-native: a ``jax.sharding.Mesh`` with a ``data`` axis (batch/DP — gradient
all-reduce rides ICI) and an optional ``model`` axis (attention heads /
Megatron-style TP). Pipeline parallelism is deliberately absent: the deepest
variant is 8 blocks of ~0.4M params — pipelining would cost more in bubbles
than it saves (see SURVEY.md §5 "distributed communication backend").
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, tp: int = 1,
              devices=None) -> Mesh:
    """Mesh of shape (n_devices // tp, tp) with axes ('data', 'model')."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    if n_devices % tp != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by tp={tp}")
    grid = np.asarray(devices[:n_devices]).reshape(n_devices // tp, tp)
    return Mesh(grid, axis_names=("data", "model"))
