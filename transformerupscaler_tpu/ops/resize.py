"""Separable image resizing as MXU matmuls, with exact PyTorch/PIL semantics.

The reference leans on three resize flavors:
  - ``F.interpolate(mode='bicubic', align_corners=False)`` (no antialias,
    cubic a=-0.75, border clamp) for the global residual branches
    (reference models/ResidualTransformer/model.py:125,160 and
    models/WindowTransformer/model.py:241,301).
  - ``torchvision.transforms.Resize`` on tensors (bilinear, antialias=True)
    for the require_ratio squash (models/FastTransformer/model.py:324) and
    train-loop mismatch squash (train.py:127-130).
  - PIL's antialiased resize (bicubic a=-0.5) for dataset pipelines and the
    bicubic baseline image (inference.py:83, data_class.py:61-68).

TPU-first design: instead of gather-based sampling (slow, scalar-ish on TPU),
each 1-D resampling pass is a dense (out_size, in_size) weight matrix built
once on the host and applied as a matmul — separable resize becomes two GEMMs
that ride the MXU, and XLA fuses the surrounding elementwise work.
"""

import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float) -> np.ndarray:
    """Cubic convolution kernel (Keys).  a=-0.75 matches PyTorch's
    non-antialiased bicubic; a=-0.5 matches PIL / torchvision-antialias."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    outer = a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a
    return np.where(ax <= 1.0, inner, np.where(ax < 2.0, outer, 0.0))


def _triangle(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


def _matrix_no_antialias(in_size: int, out_size: int, method: str, a: float) -> np.ndarray:
    """PyTorch ``F.interpolate(align_corners=False)`` semantics: fixed-width
    kernel, source coords ``(i + 0.5) * in/out - 0.5``, indices clamped to the
    border (out-of-range taps accumulate onto the edge pixel)."""
    scale = in_size / out_size
    i = np.arange(out_size, dtype=np.float64)
    src = (i + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    t = src - base

    if method == "bilinear":
        offsets = np.array([0, 1])
        weights = np.stack([1.0 - t, t], axis=1)
    elif method == "bicubic":
        offsets = np.array([-1, 0, 1, 2])
        weights = np.stack([_cubic(t - off, a) for off in offsets], axis=1)
    else:
        raise ValueError(f"unknown method {method!r}")

    idx = np.clip(base[:, None] + offsets[None, :], 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.repeat(i.astype(np.int64), len(offsets)), idx.ravel()), weights.ravel())
    return mat


def _matrix_antialias(in_size: int, out_size: int, method: str, a: float) -> np.ndarray:
    """PIL / torchvision(antialias=True) semantics: kernel support widened by
    the downscale factor, weights renormalized per output pixel."""
    if method == "bilinear":
        filt, base_support = _triangle, 1.0
    elif method == "bicubic":
        filt, base_support = (lambda x: _cubic(x, a)), 2.0
    else:
        raise ValueError(f"unknown method {method!r}")

    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = base_support * filterscale

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        j = np.arange(xmin, xmax, dtype=np.float64)
        w = filt((j + 0.5 - center) / filterscale)
        s = w.sum()
        if s != 0.0:
            w = w / s
        mat[i, xmin:xmax] = w
    return mat


@lru_cache(maxsize=None)
def resize_matrix(in_size: int, out_size: int, method: str = "bicubic",
                  antialias: bool = False, a: float | None = None) -> np.ndarray:
    """1-D resampling matrix of shape (out_size, in_size), float32.

    ``a`` defaults to -0.75 without antialias (PyTorch) and -0.5 with
    antialias (PIL / torchvision).
    """
    if a is None:
        a = -0.5 if antialias else -0.75
    if in_size == out_size:
        # Identity for every mode at scale 1 (matches both frameworks).
        return np.eye(out_size, dtype=np.float32)
    build = _matrix_antialias if antialias else _matrix_no_antialias
    return build(in_size, out_size, method, a).astype(np.float32)


@lru_cache(maxsize=None)
def _banded_factors(in_size: int, out_size: int, method: str,
                    antialias: bool, a: float | None, mb: int,
                    r: int = 1):
    """Uniform banded-block decomposition of the dense resize matrix.

    The (out, in*r) resampling matrix has ~`support` nonzeros per row (4-6
    taps), but the dense GEMM contracts the FULL input axis — at the
    headline squash that is 23.9 + 31.9 GF where the nonzero band carries
    ~5 GF (measured 0.47 ms of an 8.3 ms frame). This slices the SAME
    matrix into ceil(out/mb) row blocks, each contracting only its input
    window: identical weights, identical per-output tap order (the dropped
    terms are exact zeros, which are identities under ordered f32
    accumulation), so the result differs from the dense product only by
    XLA's K-tiling reassociation (~1e-7 relative; the parity tests' 2e-5
    tolerance and the 144-160 dB reference-parity PSNR both hold).

    Returns (weights (nb, mb, wb, r) f32, starts (nb,) int64) with
      out[b*mb + o] = sum_{k,i} weights[b,o,k,i] * x[starts[b] + k, i]
    or None when the band would cover most of the input anyway (tiny
    images, extreme ratios) — caller falls back to the dense GEMM.
    """
    mat = resize_matrix(in_size * r, out_size, method, antialias, a)
    mat3 = mat.reshape(out_size, in_size, r)
    nb = -(-out_size // mb)
    nz_any = np.any(mat3 != 0.0, axis=2)  # (out, in)
    starts = np.zeros(nb, np.int64)
    ends = np.zeros(nb, np.int64)
    for b in range(nb):
        nzc = np.nonzero(nz_any[b * mb:(b + 1) * mb].any(axis=0))[0]
        starts[b], ends[b] = ((nzc[0], nzc[-1] + 1) if len(nzc)
                              else (0, 1))
    wb = int((ends - starts).max())
    wb = min(-(-wb // 8) * 8, in_size)  # sublane-friendly
    if wb >= in_size * 0.7 or out_size < 2 * mb:
        return None  # dense is as good (and one fewer gather)
    starts = np.clip(starts, 0, in_size - wb)
    wts = np.zeros((nb, mb, wb, r), np.float32)
    for b in range(nb):
        o0, o1 = b * mb, min((b + 1) * mb, out_size)
        wts[b, :o1 - o0] = mat3[o0:o1, starts[b]:starts[b] + wb]
    return wts, starts


def _banded_on(precision=None, dtype=None) -> bool:
    """Tri-state gate for the banded decomposition.

    TUX_BANDED_RESIZE=1 forces banded, =0 forces dense; default "auto"
    uses banded only on the f32/raised-precision quality squash (where
    it measured 8.670 -> 8.502 ms in-model with f32 inputs, and 0.94 ->
    0.41 ms isolated at HIGHEST) and dense on the bf16 default path
    (where the gather + extra reshape measured a net LOSS in-model,
    8.228 -> 8.442 ms — XLA fuses the dense bf16 GEMM into neighbors
    better than the banded gather; tools/banded_bench.py).

    NOTE: =0/=1 are ALL-PATHS overrides — =1 forces banding even on
    plain bf16 ``resize()`` calls where it measured a net in-model loss.
    They exist for A/B probing (tools/banded_bench.py), not serving
    config; the shipped routing is the auto heuristic."""
    v = os.environ.get("TUX_BANDED_RESIZE", "auto")
    if v in ("0", "1"):
        return v == "1"
    return precision is not None or dtype == jnp.float32


_MB = 128  # output rows per band block: one full MXU M tile


def resize(x: jnp.ndarray, out_hw: tuple[int, int], method: str = "bicubic",
           antialias: bool = False, a: float | None = None) -> jnp.ndarray:
    """Resize NHWC (or HWC) images to ``out_hw`` via two MXU matmuls."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    oh, ow = out_hw
    dtype = x.dtype
    # auto -> dense: plain resize() has no raised-precision context, and
    # banding the bf16 path measured a net in-model loss (_banded_on
    # docstring). TUX_BANDED_RESIZE=1 still force-bands this path too
    # (documented all-paths probing override).
    banded = _banded_on()
    if oh != h:
        bf = (_banded_factors(h, oh, method, antialias, a, _MB)
              if banded else None)
        if bf is None:
            wh = jnp.asarray(resize_matrix(h, oh, method, antialias, a),
                             dtype=dtype)
            x = jnp.einsum("oh,bhwc->bowc", wh, x)
        else:
            wts, starts = bf
            nb, mb, wb, _ = wts.shape
            idx = starts[:, None] + np.arange(wb)  # (nb, wb) static
            xw = x[:, idx]  # (n, nb, wb, w, c)
            x = jnp.einsum("Bok,nBkwc->nBowc",
                           jnp.asarray(wts[..., 0], dtype), xw)
            x = x.reshape(x.shape[0], nb * mb, w, -1)[:, :oh]
    if ow != w:
        bf = (_banded_factors(w, ow, method, antialias, a, _MB)
              if banded else None)
        if bf is None:
            ww = jnp.asarray(resize_matrix(w, ow, method, antialias, a),
                             dtype=dtype)
            x = jnp.einsum("pw,bhwc->bhpc", ww, x)
        else:
            wts, starts = bf
            nb, mb, wb, _ = wts.shape
            idx = starts[:, None] + np.arange(wb)
            xw = x[:, :, idx]  # (n, oh, nb, wb, c)
            x = jnp.einsum("Bpk,nhBkc->nhBpc",
                           jnp.asarray(wts[..., 0], dtype), xw)
            x = x.reshape(x.shape[0], x.shape[1], nb * mb, -1)[:, :, :ow]
    out = x.astype(dtype)
    return out[0] if squeeze else out


def resize_shuffled(z: jnp.ndarray, r: int, out_hw: tuple[int, int],
                    method: str = "bilinear", antialias: bool = True,
                    a: float | None = None,
                    precision=None) -> jnp.ndarray:
    """``resize(pixel_shuffle(z, r), out_hw)`` without materializing the
    shuffled image — exact up to fp reassociation.

    ``z``: (B, H, W, C*r*r) with channels ordered (c, i, j) like
    ops.pixel_shuffle. Because the shuffle is a permutation and the resize is
    linear, the (out, in) resize matrices split by phase:
    ``M_i[o, h] = M[o, h*r + i]`` — and apply directly in the packed domain.

    This kills the serving path's worst stage: the reference's require_ratio
    squash (FastTransformer/model.py:322-325) resized the full 2x-upscaled
    image with 3-channel matmuls (measured 8.9 ms of a 28.7 ms frame on v5e —
    3 output lanes of 128 used); the packed form contracts (h, i) and (w, j)
    jointly with all 128 lanes busy and 4x fewer pixels touched.
    """
    b, h, w, crr = z.shape
    c = crr // (r * r)
    oh, ow = out_hw
    dtype = z.dtype
    # precision: forwarded to the two einsums. On TPU, f32 matmuls round
    # their operands to bf16 at the default precision — the LAST op touching
    # the output image would re-round it even when the tails emit f32
    # (serve_quality mode passes HIGHEST to keep the image f32 end-to-end).
    z6 = z.reshape(b, h, w, c, r, r)
    banded = _banded_on(precision, dtype)
    bf = (_banded_factors(h, oh, method, antialias, a, _MB, r)
          if banded else None)
    if bf is None:
        mh = resize_matrix(h * r, oh, method, antialias, a).reshape(oh, h, r)
        t = jnp.einsum("ohi,nhwcij->nowcj", jnp.asarray(mh, dtype), z6,
                       precision=precision)
    else:
        wts, starts = bf  # (nb, mb, wb, r), (nb,)
        nb, mb, wb, _ = wts.shape
        idx = starts[:, None] + np.arange(wb)  # (nb, wb) static
        zw = z6[:, idx]  # (n, nb, wb, w, c, r, r)
        t = jnp.einsum("Boki,nBkwcij->nBowcj", jnp.asarray(wts, dtype), zw,
                       precision=precision)
        t = t.reshape(b, nb * mb, w, c, r)[:, :oh]
    bf = (_banded_factors(w, ow, method, antialias, a, _MB, r)
          if banded else None)
    if bf is None:
        mw = resize_matrix(w * r, ow, method, antialias, a).reshape(ow, w, r)
        out = jnp.einsum("pwj,nowcj->nopc", jnp.asarray(mw, dtype), t,
                         precision=precision)
    else:
        wts, starts = bf
        nb, mb, wb, _ = wts.shape
        idx = starts[:, None] + np.arange(wb)
        tw = t[:, :, idx]  # (n, oh, nb, wb, c, j)
        out = jnp.einsum("Bpkj,noBkcj->noBpc", jnp.asarray(wts, dtype), tw,
                         precision=precision)
        out = out.reshape(b, oh, nb * mb, c)[:, :, :ow]
    return out.astype(dtype)


@lru_cache(maxsize=None)
def bicubic_shuffle_kernel(r: int, c: int = 3) -> np.ndarray:
    """Integer-scale bicubic upscaling (torch ``F.interpolate(bicubic,
    align_corners=False)``) expressed as ONE conv kernel emitting
    pixel_shuffle(r)-ordered channels at base resolution.

    For integer r every output phase l reads 4 input pixels at offsets
    base_l + [-1..2] with base_l in {-1, 0} (|src - pixel| < 0.5), so all
    phases fit a 5-tap frame. Returns (5, 5, c, c*r*r) float32, channels
    ordered (c, i, j). Apply as a VALID conv over an input edge-padded by 2
    pixels — edge replication is EXACTLY torch's border index clamp. The
    separable outer product reproduces the 2-D 16-tap bicubic bit-for-bit
    (modulo fp reassociation).

    Why: the matrix-based resize contracts W with only c=3 minor lanes
    (measured 8.9 ms for a 3-channel squash at 1440p on v5e); as a
    block-packed conv (ops/conv.conv2d_tail_packed_valid) all 128 MXU lanes
    stay busy.
    """
    k1d = np.zeros((5, r), np.float64)
    for l in range(r):
        src = (l + 0.5) / r - 0.5
        base = int(np.floor(src))
        frac = src - base
        for m in (-1, 0, 1, 2):
            k1d[base + m + 2, l] = _cubic(np.array([frac - m]), -0.75)[0]
    kern = np.zeros((5, 5, c, c * r * r), np.float64)
    for ch in range(c):
        for i in range(r):
            for j in range(r):
                kern[:, :, ch, ch * r * r + i * r + j] = np.outer(
                    k1d[:, i], k1d[:, j])
    return kern.astype(np.float32)


def bicubic_upscale_conv_packed(x: jnp.ndarray, r: int,
                                block: int | None = None) -> jnp.ndarray:
    """``interpolate_bicubic(x, (H*r, W*r))`` as a single block-packed conv;
    returns the PRE-SHUFFLE tensor (B, H, W, C*r*r) in pixel_shuffle(r)
    channel order (caller shuffles or feeds resize_shuffled / adds other
    pre-shuffle tensors). Exact incl. borders (edge padding == index clamp).
    W must be even."""
    from transformerupscaler_tpu.ops.conv import (
        conv2d_tail_packed_valid,
        tail_block,
    )

    b, h, w, c = x.shape
    xe = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    xp = xe.reshape(b, h + 4, (w + 4) // 2, 2 * c)
    kern = jnp.asarray(bicubic_shuffle_kernel(r, c), x.dtype)
    if block is None:
        block = tail_block(c * r * r, w)
    out = conv2d_tail_packed_valid(xp, kern, block=block)
    return out.reshape(b, h, w, c * r * r)


def interpolate_bicubic(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Parity with ``F.interpolate(x, size, mode='bicubic',
    align_corners=False)`` (reference ResidualTransformer/model.py:125)."""
    return resize(x, out_hw, method="bicubic", antialias=False)


def resize_antialias_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Parity with ``torchvision.transforms.Resize(size)`` applied to tensors
    (bilinear, antialias=True; reference FastTransformer/model.py:324)."""
    return resize(x, out_hw, method="bilinear", antialias=True)
