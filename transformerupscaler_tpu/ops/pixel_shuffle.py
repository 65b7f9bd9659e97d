"""Sub-pixel (depth-to-space) upsampling.

Parity: ``torch.nn.PixelShuffle(r)`` as used by the reference Upsampler
(models/FastTransformer/utils.py:62,71,80): NCHW input (B, C*r^2, H, W) maps
output[b, c, h*r+i, w*r+j] = input[b, c*r*r + i*r + j, h, w].

This module works in NHWC (TPU-native layout): input (B, H, W, C*r^2) with the
channel axis ordered as (c, i, j) — i.e. the producing conv's output channels
are laid out exactly like PyTorch's — and returns (B, H*r, W*r, C).
"""

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    # -> (B, H, r_i, W, r_j, C)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)
