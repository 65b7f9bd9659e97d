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
def _commute_maps(r: int, k: int = 3):
    """Index maps for commuting a k x k (odd) conv through pixel_shuffle(r).

    For high-res offset (dm, dn) and output phase (a, b), the low-res
    equivalent reads input phase (p, q) at low-res offset (di, dj) where
    dm = di*r + p - a (same for dn). Exactly one (dm, dn) feeds each
    (di, dj, p, q, a, b) combination, or none. The base-resolution kernel
    spans di in [-pad_lo, pad_lo] with pad_lo = ceil((pad + r - 1) / r).
    """
    pad = (k - 1) // 2
    pad_lo = (pad + r - 1) // r
    klo = 2 * pad_lo + 1
    rr = r * r
    dm_idx = np.zeros((klo, klo, rr, rr), np.int64)
    dn_idx = np.zeros((klo, klo, rr, rr), np.int64)
    mask = np.zeros((klo, klo, rr, rr), bool)
    for di in range(-pad_lo, pad_lo + 1):
        for dj in range(-pad_lo, pad_lo + 1):
            for p in range(r):
                for q in range(r):
                    for a in range(r):
                        for b in range(r):
                            dm = di * r + p - a
                            dn = dj * r + q - b
                            if -pad <= dm <= pad and -pad <= dn <= pad:
                                ij = (di + pad_lo, dj + pad_lo,
                                      p * r + q, a * r + b)
                                dm_idx[ij] = dm + pad
                                dn_idx[ij] = dn + pad
                                mask[ij] = True
    return dm_idx, dn_idx, mask


def commute_conv_through_shuffle(kernel: jnp.ndarray, r: int) -> jnp.ndarray:
    """Repack an odd k x k HWIO kernel meant for ``conv(pixel_shuffle_r(x))``
    into an equivalent kernel for ``pixel_shuffle_r(conv'(x))``.

    (k, k, C, O) at r-fold resolution -> (k', k', C*r^2, O*r^2) at base
    resolution with k' = 2*ceil(((k-1)/2 + r - 1)/r) + 1 (3x3 stays 3x3 for
    every r; a 5x5 through r=2 becomes 3x3). Exact: same multiply-adds, same
    zero-padding semantics at the border (any tap reading a padded high-res
    pixel reads a padded base-res packed pixel). This is the key TPU fix for
    the reference's 3-channel convs at upscaled resolution
    (FastTransformer/model.py:265,317) — 3 output lanes waste 125/128 of the
    MXU; r^2-packed channels at 1/r^2 the pixels do not. Channel orders
    match ops.pixel_shuffle: input (c, p, q), output (o, a, b).
    """
    k = int(kernel.shape[0])
    dm_idx, dn_idx, mask = _commute_maps(r, k)
    klo = dm_idx.shape[0]
    c, o = kernel.shape[2], kernel.shape[3]
    g = kernel[dm_idx, dn_idx]  # (k', k', r^2(pq), r^2(ab), C, O)
    g = jnp.where(jnp.asarray(mask)[..., None, None], g, 0)
    g = g.transpose(0, 1, 4, 2, 5, 3)  # (k', k', C, pq, O, ab)
    return g.reshape(klo, klo, c * r * r, o * r * r)
