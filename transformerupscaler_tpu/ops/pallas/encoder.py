"""Fused encoder / decoder conv kernels (Pallas, row-streamed).

ARCHIVED (round 3): these whole-branch kernels measured a real win but the
per-tap sublane-split gathers in ``_tail_macro8`` blow up the remote Mosaic
compiler (741 s / OOM SIGKILL — PERFORMANCE.md). Superseded by
ops/pallas/stream.py, which keeps the same reduction sets with contiguous
access patterns and compiles in seconds; the packing helpers below
(pack_conv3, pack_tail_macro8, _conv3_packed) remain live imports of
stream.py. See ops/pallas/README.md for the full estate.

These replace the serving path's conv chains — its largest cost: XLA runs
the 3x3 64->64 convs at ~30 TF/s, the small-output tails at <10% lane
utilization, and every op boundary rewrites the 118 MB feature map through
HBM. Measured v5e facts that shaped the design (tools/bw_bench.py):
  - (.., 128)-minor layouts stream at ~800 GB/s; 64-lane NHWC at ~427.
  - every VMEM tile must be (8n, 128)-aligned (a (.., 4, 128) block pays 4x).

Design:
  - All tensors ride the width-2-packed layout (H, W/2, 128) — a pure
    bitcast of NHWC (H, W, 64).
  - One grid cell computes R=8 output rows. Halo rows come from two extra
    4-row-granular BlockSpec views of the same input (index_maps clamped at
    the edges; boundary cells zero their halo — torch zero-pad semantics).
  - 3x3 convs: 9 static-slice (M,128)x(128,128) MXU matmuls per cell (the
    packed-pair kernel doubles MACs but fills all lanes).
  - Small-output composed tails (branch A 5x5 64->12, decoder 7x7 64->12)
    use macro-8 outputs: 8 adjacent pixels' channels stacked to 96 lanes;
    taps are gathered with de-strided static slices of a sublane-split
    (rows, groups, 4, 128) view — no strided or dynamic slicing anywhere.

Encoder kernel: feat1 (=conv1 output) -> conv2+relu -> feat
                                       -> composed branch-A (+relu) -> a12.
Decoder kernel: combined -> dec1+relu -> composed dec2∘B-tail -> b12.

Parity: reference FastTransformer/model.py:251-252, :263-265 (branch A),
:312-317 (decoder + final_upscale tail); exact vs the XLA composed path
modulo bf16 reassociation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 8  # output rows per grid cell


def pack_conv3(kernel) -> jnp.ndarray:
    """(3,3,64,64) HWIO -> (3,3,128,128) width-2-packed kernel (exact)."""
    kh, kw, cin, cout = kernel.shape
    kp = jnp.zeros((kh, 3, 2 * cin, 2 * cout), jnp.float32)
    kn = jnp.asarray(kernel, jnp.float32)
    for Xp in range(3):
        for pxi in range(2):
            for pxo in range(2):
                dx = 2 * Xp - 1 + pxi - pxo
                if 0 <= dx < kw:
                    kp = kp.at[:, Xp, pxi * cin:(pxi + 1) * cin,
                               pxo * cout:(pxo + 1) * cout].set(kn[:, dx])
    return kp


def pack_tail_macro8(kernel) -> tuple[jnp.ndarray, int]:
    """(kh,kw,64,co) composed tail -> ((kh, wcols, 128, 8*co), boff).

    Output block b covers pixels 8b..8b+7 (lane s*co+c_out). Input pixel for
    (s, tap dx0) is 8b+s+dx0-pad -> packed col 4b + (c - boff) with
    c = floor((s+dx0-pad)/2) + boff, boff = (pad+1)//2, parity pxi."""
    kh, kw, cin, co = kernel.shape
    assert cin == 64
    pad = (kw - 1) // 2
    boff = (pad + 1) // 2
    wcols = (7 + kw - 1 - pad) // 2 + boff + 1
    # jnp (not numpy) so the packing traces under jit: the weights are
    # runtime args of the serving function. For fixed s the (c, pxi) slots
    # are distinct across dx0, so .set == the reference's +=.
    kp = jnp.zeros((kh, wcols, 128, 8 * co), jnp.float32)
    kn = jnp.asarray(kernel, jnp.float32)
    for s in range(8):
        for dx0 in range(kw):
            t = s + dx0 - pad
            c = (t - (t % 2)) // 2 + boff  # floor division for negatives
            pxi = t % 2
            kp = kp.at[:, c, pxi * 64:(pxi + 1) * 64,
                       s * co:(s + 1) * co].add(kn[:, dx0])
    return kp, boff


def _conv3_packed(slab, w_ref, rows, wp2, bias_ref, relu):
    """slab: (rows+2, wp2+2, 128) zero-padded input. -> (rows, wp2, 128) f32
    with bias (+relu)."""
    acc = jnp.zeros((rows * wp2, 128), jnp.float32)
    for dy in range(3):
        for xp in range(3):
            x = slab[dy:dy + rows, xp:xp + wp2, :]
            acc = acc + jnp.dot(x.reshape(rows * wp2, 128), w_ref[dy, xp],
                                preferred_element_type=jnp.float32)
    acc = acc + bias_ref[0:1, :].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc.reshape(rows, wp2, 128)


def _tail_macro8(src_ref, w_ref, b_ref, rows, wb, boff, relu):
    """src_ref: (rows + kh - 1, 4*(wb+2), 128) scratch whose real packed
    cols sit at offset 4 (one zero group each side). Output row o uses src
    rows o..o+kh-1. -> (rows, wb, 8*co) f32."""
    kh, wcols = w_ref.shape[0], w_ref.shape[1]
    nout = w_ref.shape[3]
    src = src_ref[:].reshape(src_ref.shape[0], src_ref.shape[1] // 4, 4, 128)
    acc = jnp.zeros((rows * wb, nout), jnp.float32)
    for dy in range(kh):
        for c in range(wcols):
            rel = c - boff + 4  # packed col offset within the padded scratch
            g, r = rel // 4, rel % 4
            piece = src[dy:dy + rows, g:g + wb, r, :]
            acc = acc + jnp.dot(piece.reshape(rows * wb, 128), w_ref[dy, c],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0:1, :].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc.reshape(rows, wb, nout)


def _encoder_kernel(cur, above, below, w2, b2, wa, ba, feat_out, a12_out,
                    slab, c2p, *, wp2, boff_a, relu_a):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    r = _R
    dt = feat_out.dtype

    # feat1 slab rows [iR-3, iR+R+3), packed cols padded by 1 each side
    slab[:] = jnp.zeros_like(slab)
    slab[3:3 + r, 1:1 + wp2, :] = cur[0]

    @pl.when(i > 0)
    def _():
        slab[0:3, 1:1 + wp2, :] = above[0, 1:4]

    @pl.when(i < n - 1)
    def _():
        slab[3 + r:6 + r, 1:1 + wp2, :] = below[0, 0:3]

    # conv2 rows [iR-2, iR+R+2): slab row j+? -> conv2 row iR-2+j uses slab
    # rows j..j+2 (slab row 0 = iR-3).
    c2p[:] = jnp.zeros_like(c2p)
    y = _conv3_packed(slab, w2, r + 4, wp2, b2, relu=True)
    c2p[:, 4:4 + wp2, :] = y.astype(dt)

    # rows outside the image must be ZERO for branch A's 5x5 zero-pad
    # semantics (conv2 of a zero slab is not zero).
    @pl.when(i == 0)
    def _():
        c2p[0:2] = jnp.zeros_like(c2p[0:2])

    @pl.when(i == n - 1)
    def _():
        c2p[r + 2:r + 4] = jnp.zeros_like(c2p[r + 2:r + 4])

    feat_out[0] = c2p[2:2 + r, 4:4 + wp2, :]

    a12 = _tail_macro8(c2p, wa, ba, r, a12_out.shape[2], boff_a, relu_a)
    a12_out[0] = a12.astype(dt)


def _decoder_kernel(cur, above, below, w1, b1, wc, bc, b12_out,
                    slab, d1p, *, wp2, boff_c):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    r = _R
    dt = b12_out.dtype

    # combined slab rows [iR-4, iR+R+4)
    slab[:] = jnp.zeros_like(slab)
    slab[4:4 + r, 1:1 + wp2, :] = cur[0]

    @pl.when(i > 0)
    def _():
        slab[0:4, 1:1 + wp2, :] = above[0]

    @pl.when(i < n - 1)
    def _():
        slab[4 + r:8 + r, 1:1 + wp2, :] = below[0]

    # dec1 rows [iR-3, iR+R+3)
    d1p[:] = jnp.zeros_like(d1p)
    y = _conv3_packed(slab, w1, r + 6, wp2, b1, relu=True)
    d1p[:, 4:4 + wp2, :] = y.astype(dt)

    @pl.when(i == 0)
    def _():
        d1p[0:3] = jnp.zeros_like(d1p[0:3])

    @pl.when(i == n - 1)
    def _():
        d1p[r + 3:r + 6] = jnp.zeros_like(d1p[r + 3:r + 6])

    b12 = _tail_macro8(d1p, wc, bc, r, b12_out.shape[2], boff_c, relu=False)
    b12_out[0] = b12.astype(dt)


def _halo_specs(b, h, wp2):
    """cur + 4-row-granular above/below views of one (B,H,WP2,128) array."""
    nr = _R // 4
    last = h // 4 - 1
    return [
        pl.BlockSpec((1, _R, wp2, 128), lambda nb, i: (nb, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, wp2, 128),
                     lambda nb, i: (nb, jnp.maximum(i * nr - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, wp2, 128),
                     lambda nb, i: (nb, jnp.minimum(i * nr + nr, last), 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _wspec(a):
    return pl.BlockSpec(a.shape, lambda nb, i: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


def _prep(x):
    """NHWC (B,H,W,64) -> packed (B,H,W/2,128) view (pure bitcast)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def encoder_supported(x_shape) -> bool:
    b, h, w, c = x_shape
    return c == 64 and h % _R == 0 and w % 8 == 0


def fused_encoder(feat1: jnp.ndarray, k2, b2, ka, ba, relu_a: bool = True,
                  interpret: bool | None = None):
    """feat1: (B,H,W,64) conv1 output. k2/b2: 3x3 64->64 (+bias). ka/ba: the
    composed branch-A kernel (5,5,64,12). Returns (feat (B,H,W,64),
    a12 (B,H,W/8,96) macro-8 layout; reshape to (B,H,W,12) is free)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, _ = feat1.shape
    wp2, wb = w // 2, w // 8
    dt = feat1.dtype
    xp = _prep(feat1)

    w2 = pack_conv3(k2).astype(dt)
    b2p = jnp.tile(jnp.asarray(b2, dt).reshape(1, 64), (1, 2))
    wa, boff = pack_tail_macro8(ka)
    wa = wa.astype(dt)
    bap = jnp.tile(jnp.asarray(ba, dt).reshape(1, 12), (1, 8))

    feat, a12 = pl.pallas_call(
        partial(_encoder_kernel, wp2=wp2, boff_a=boff, relu_a=relu_a),
        grid=(b, h // _R),
        in_specs=_halo_specs(b, h, wp2) + [_wspec(w2), _wspec(b2p),
                                           _wspec(wa), _wspec(bap)],
        out_specs=[
            pl.BlockSpec((1, _R, wp2, 128), lambda nb, i: (nb, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _R, wb, 96), lambda nb, i: (nb, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, h, wp2, 128), dt),
                   jax.ShapeDtypeStruct((b, h, wb, 96), dt)],
        scratch_shapes=[pltpu.VMEM((_R + 6, wp2 + 2, 128), dt),
                        pltpu.VMEM((_R + 4, 4 * (wb + 2), 128), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, xp, w2, b2p, wa, bap)
    return feat.reshape(b, h, w, 64), a12


def fused_decoder(combined: jnp.ndarray, k1, b1, kc, bc,
                  interpret: bool | None = None):
    """combined: (B,H,W,64). k1/b1: decoder_conv1. kc/bc: composed
    dec2∘B-tail kernel (7,7,64,12). Returns b12 (B,H,W/8,96)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, _ = combined.shape
    wp2, wb = w // 2, w // 8
    dt = combined.dtype
    xp = _prep(combined)

    w1 = pack_conv3(k1).astype(dt)
    b1p = jnp.tile(jnp.asarray(b1, dt).reshape(1, 64), (1, 2))
    wc, boff = pack_tail_macro8(kc)
    wc = wc.astype(dt)
    bcp = jnp.tile(jnp.asarray(bc, dt).reshape(1, 12), (1, 8))

    b12 = pl.pallas_call(
        partial(_decoder_kernel, wp2=wp2, boff_c=boff),
        grid=(b, h // _R),
        in_specs=_halo_specs(b, h, wp2) + [_wspec(w1), _wspec(b1p),
                                           _wspec(wc), _wspec(bcp)],
        out_specs=pl.BlockSpec((1, _R, wb, 96), lambda nb, i: (nb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wb, 96), dt),
        scratch_shapes=[pltpu.VMEM((_R + 8, wp2 + 2, 128), dt),
                        pltpu.VMEM((_R + 6, 4 * (wb + 2), 128), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, xp, w1, b1p, wc, bcp)
    return b12


def macro8_to_nhwc(a: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W/8,8*co) macro-8 -> (B,H,W,co); contiguous, so a free reshape."""
    b, h, wb, n = a.shape
    return a.reshape(b, h, wb * 8, n // 8)
