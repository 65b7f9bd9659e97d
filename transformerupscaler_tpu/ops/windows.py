"""Window partition/reverse for window-based attention.

Parity: reference models/WindowTransformer/model.py:29-61 (same (B, H, W, C)
<-> (B, nWindows, ws*ws, C) layout). On TPU these are pure reshape/transpose
ops that XLA folds into the surrounding copies; the Pallas attention kernel
additionally folds the partition into its block layout so these never
materialize in HBM on the fused path.
"""

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nH*nW, window_size**2, C); H, W must divide."""
    b, h, w, c = x.shape
    ws = window_size
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // ws) * (w // ws), ws * ws, c)


def window_reverse(windows: jnp.ndarray, window_size: int, h: int, w: int) -> jnp.ndarray:
    """(B, nWindows, window_size**2, C) -> (B, H, W, C)."""
    b = windows.shape[0]
    ws = window_size
    c = windows.shape[-1]
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)
