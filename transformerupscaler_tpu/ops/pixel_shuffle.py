"""Sub-pixel (depth-to-space) upsampling.

Parity: ``torch.nn.PixelShuffle(r)`` as used by the reference Upsampler
(models/FastTransformer/utils.py:62,71,80): NCHW input (B, C*r^2, H, W) maps
output[b, c, h*r+i, w*r+j] = input[b, c*r*r + i*r + j, h, w].

This module works in NHWC (TPU-native layout): input (B, H, W, C*r^2) with the
channel axis ordered as (c, i, j) — i.e. the producing conv's output channels
are laid out exactly like PyTorch's — and returns (B, H*r, W*r, C).
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    # -> (B, H, r_i, W, r_j, C)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


@lru_cache(maxsize=None)
def _commute_maps(r: int):
    """Index maps for commuting a 3x3 conv through pixel_shuffle(r).

    For high-res offset (dm, dn) and output phase (a, b), the low-res
    equivalent reads input phase (p, q) at low-res offset (di, dj) where
    dm = di*r + p - a (same for dn). Exactly one (dm, dn) feeds each
    (di, dj, p, q, a, b) combination, or none.
    """
    rr = r * r
    dm_idx = np.zeros((3, 3, rr, rr), np.int64)
    dn_idx = np.zeros((3, 3, rr, rr), np.int64)
    mask = np.zeros((3, 3, rr, rr), bool)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for p in range(r):
                for q in range(r):
                    for a in range(r):
                        for b in range(r):
                            dm = di * r + p - a
                            dn = dj * r + q - b
                            if -1 <= dm <= 1 and -1 <= dn <= 1:
                                ij = (di + 1, dj + 1, p * r + q, a * r + b)
                                dm_idx[ij] = dm + 1
                                dn_idx[ij] = dn + 1
                                mask[ij] = True
    return dm_idx, dn_idx, mask


def commute_conv_through_shuffle(kernel: jnp.ndarray, r: int) -> jnp.ndarray:
    """Repack a 3x3 HWIO kernel meant for ``conv(pixel_shuffle_r(x))`` into an
    equivalent kernel for ``pixel_shuffle_r(conv'(x))``.

    (C, O) at r-fold resolution -> (C*r^2, O*r^2) at base resolution. Exact:
    same multiply-adds, same zero-padding semantics at the border. This is
    the key TPU fix for the reference's 3-channel convs at upscaled
    resolution (FastTransformer/model.py:265,317) — 3 output lanes waste
    125/128 of the MXU; r^2-packed channels at 1/r^2 the pixels do not.
    """
    dm_idx, dn_idx, mask = _commute_maps(r)
    c, o = kernel.shape[2], kernel.shape[3]
    g = kernel[dm_idx, dn_idx]  # (3, 3, r^2(pq), r^2(ab), C, O)
    g = jnp.where(jnp.asarray(mask)[..., None, None], g, 0)
    g = g.transpose(0, 1, 4, 2, 5, 3)  # (3, 3, C, pq, O, ab)
    return g.reshape(3, 3, c * r * r, o * r * r)
