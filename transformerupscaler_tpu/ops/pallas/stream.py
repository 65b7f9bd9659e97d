"""Standalone row-streamed Pallas kernels for the packed serving path.

Round-2's fused encoder/decoder kernels (ops/pallas/encoder.py) measured a
real win but blew up the remote Mosaic compiler (741 s / OOM) — isolated to
the per-tap de-strided slices of a sublane-split (rows, groups, 4, 128)
scratch view inside ``_tail_macro8`` (PERFORMANCE.md). These kernels keep
the same math with compile-friendly access patterns:

  - ``conv3x3_packed_stream``: just the 3x3 conv on the width-2-packed
    layout — 9 static-slice (M, 128) x (128, 128) MXU matmuls per 8-row
    cell, nothing else. (XLA's conv emitter runs these at ~65 TF/s bf16;
    dense static-slice GEMMs should do better.)
  - ``tail_macro8_stream``: the composed-tail macro-8 GEMMs reading a
    PRE-DE-INTERLEAVED input laid out (B, H, 4, W/8, 128) — packed col
    4g + j lives at [:, :, j, g, :], so every tap slice in the kernel is a
    CONTIGUOUS static slice (no strided or sublane-split access anywhere).
    The one-time de-interleave runs in XLA (``deinterleave4``, a single
    transpose at ~2 HBM passes).

Parity: same reduction set as ops/conv.conv2d_packed_raw /
conv2d_tail_packed(block=8) — exact modulo bf16 reassociation. Serving-only
(no VJPs).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformerupscaler_tpu.ops.pallas.encoder import (
    _conv3_packed,
    _wspec,
    pack_conv3,
    pack_tail_macro8,
)


def _halo_specs_r(b, h, wp2, rows):
    """cur + 4-row-granular above/below views of one (B, H, WP2, 128) array
    (generalization of encoder._halo_specs to a tunable row block)."""
    import jax.numpy as jnp

    nr = rows // 4
    last = h // 4 - 1
    return [
        pl.BlockSpec((1, rows, wp2, 128), lambda nb, i: (nb, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, wp2, 128),
                     lambda nb, i: (nb, jnp.maximum(i * nr - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, wp2, 128),
                     lambda nb, i: (nb, jnp.minimum(i * nr + nr, last), 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _conv_kernel(cur, above, below, w, b, out, slab, *, wp2, rows, relu):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    dt = out.dtype

    slab[:] = jnp.zeros_like(slab)
    slab[1:1 + rows, 1:1 + wp2, :] = cur[0]

    @pl.when(i > 0)
    def _():
        slab[0:1, 1:1 + wp2, :] = above[0, 3:4]

    @pl.when(i < n - 1)
    def _():
        slab[1 + rows:2 + rows, 1:1 + wp2, :] = below[0, 0:1]

    y = _conv3_packed(slab, w, rows, wp2, b, relu=relu)
    out[0] = y.astype(dt)


def conv3x3_packed_stream(xp: jnp.ndarray, kernel, bias,
                          relu: bool = False, rows: int = 16,
                          interpret: bool | None = None) -> jnp.ndarray:
    """3x3 same-pad conv on the width-2-packed layout, row-streamed.

    xp: (B, H, W/2, 2*64) packed input; kernel (3, 3, 64, 64) HWIO raw.
    Returns packed (B, H, W/2, 128). H % rows == 0, rows % 4 == 0
    (rows swept on v5e @720p: 8 -> 1.43 ms, 16 -> 1.10, 24 -> 1.39,
    48 -> 1.50; XLA conv emitter: 1.87).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, wp2, _ = xp.shape
    if h % rows:
        # Fall back through the other swept sizes (24 ties 16 at 1.43 ms on
        # v5e; 8 is the slowest at 1.73) before the 8-row floor.
        rows = next((r for r in (16, 24, 8) if h % r == 0), 8)
    dt = xp.dtype
    w = pack_conv3(kernel).astype(dt)
    bp = jnp.tile(jnp.asarray(bias, jnp.float32).reshape(1, 64), (1, 2))
    out = pl.pallas_call(
        partial(_conv_kernel, wp2=wp2, rows=rows, relu=relu),
        grid=(b, h // rows),
        in_specs=_halo_specs_r(b, h, wp2, rows) + [_wspec(w), _wspec(bp)],
        out_specs=pl.BlockSpec((1, rows, wp2, 128),
                               lambda nb, i: (nb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wp2, 128), dt),
        scratch_shapes=[pltpu.VMEM((rows + 2, wp2 + 2, 128), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, xp, w, bp)
    return out


def _conv_int8_kernel(cur, above, below, w, scale, bias, out, slab, *,
                      wp2, rows, relu):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    dt = out.dtype

    slab[:] = jnp.zeros_like(slab)
    slab[1:1 + rows, 1:1 + wp2, :] = cur[0]

    @pl.when(i > 0)
    def _():
        slab[0:1, 1:1 + wp2, :] = above[0, 3:4]

    @pl.when(i < n - 1)
    def _():
        slab[1 + rows:2 + rows, 1:1 + wp2, :] = below[0, 0:1]

    acc = jnp.zeros((rows * wp2, 128), jnp.int32)
    for dy in range(3):
        for xp in range(3):
            x = slab[dy:dy + rows, xp:xp + wp2, :]
            acc = acc + jnp.dot(x.reshape(rows * wp2, 128), w[dy, xp],
                                preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale[0:1, :] + bias[0:1, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out[0] = y.reshape(rows, wp2, 128).astype(dt)


def conv3x3_packed_int8_stream(xq: jnp.ndarray, kernel, x_scale,
                               bias=None, relu: bool = False,
                               out_dtype=jnp.bfloat16, rows: int = 16,
                               interpret: bool | None = None) -> jnp.ndarray:
    """conv3x3_packed_stream with int8 MXU compute (int8 x int8 -> int32).

    xq: (B, H, W/2, 128) int8, pre-quantized per RAW channel with
    ``x_scale`` (64,); kernel: raw float HWIO (3, 3, 64, 64). The
    activation scale folds into the kernel before per-output-channel weight
    quantization — the same reduction set as ops/conv.conv2d_packed_int8
    (exact modulo f32 epilogue reassociation).

    Why this exists: the XLA int8 conv is fast (0.34 ms vs 1.10 Pallas bf16
    @720p) but its conv-emitter output layout poisons every downstream
    Pallas call with a 12 ms generic relayout (tools/int8_pallas_iso3.py
    P1/P4) — an int8 producer with default-layout output unblocks the
    int8 + Pallas-patch serving composition.
    """
    from transformerupscaler_tpu.ops.quant import quantize_conv_kernel

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, wp2, _ = xq.shape
    if h % rows:
        rows = 8
    keff = (jnp.asarray(kernel, jnp.float32)
            * jnp.asarray(x_scale, jnp.float32).reshape(1, 1, -1, 1))
    kq, ks = quantize_conv_kernel(keff)
    # pack_conv3's zero slots and +-127 integer entries are exact in f32,
    # so the int8 round-trip through the packer is lossless.
    w = pack_conv3(kq).astype(jnp.int8)
    sc = jnp.tile(ks, 2).reshape(1, 128).astype(jnp.float32)
    bb = (jnp.tile(jnp.asarray(bias, jnp.float32), 2) if bias is not None
          else jnp.zeros((128,), jnp.float32)).reshape(1, 128)
    out = pl.pallas_call(
        partial(_conv_int8_kernel, wp2=wp2, rows=rows, relu=relu),
        grid=(b, h // rows),
        in_specs=_halo_specs_r(b, h, wp2, rows) + [_wspec(w), _wspec(sc),
                                                   _wspec(bb)],
        out_specs=pl.BlockSpec((1, rows, wp2, 128),
                               lambda nb, i: (nb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wp2, 128), out_dtype),
        scratch_shapes=[pltpu.VMEM((rows + 2, wp2 + 2, 128), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xq, xq, xq, w, sc, bb)
    return out


def deinterleave4(xp: jnp.ndarray) -> jnp.ndarray:
    """(B, H, WP2, 128) packed -> (B, H, 4, WP2/4, 128): packed col 4g + j
    at [:, :, j, g, :] (one XLA transpose; makes every tail tap contiguous).
    """
    b, h, wp2, c = xp.shape
    return xp.reshape(b, h, wp2 // 4, 4, c).transpose(0, 1, 3, 2, 4)


def interleave4(xt: jnp.ndarray) -> jnp.ndarray:
    """Inverse of deinterleave4: (B, H, 4, G, 128) -> (B, H, 4G, 128)."""
    b, h, _, g, c = xt.shape
    return xt.transpose(0, 1, 3, 2, 4).reshape(b, h, 4 * g, c)


def _unembed_kernel(tok, featd, w, bias, *rest, ps, relu, deq):
    """One token row -> ps output rows, directly in deinterleave4 layout.

    The 8x8 patch 'scatter' needs NO gather or reshape: with the unembed
    kernel columns permuted to (dy, px, parity, ch) order, the GEMM result's
    column block (dy*4+px)*128 IS the deinterleaved output row [dy, px] —
    every store a contiguous static (wt, 128) slice.
    """
    if deq:
        fs, out = rest
    else:
        out, = rest
    dt = out.dtype
    g = jnp.dot(tok[0, 0], w[:], preferred_element_type=jnp.float32)
    bb = bias[0:1, :].astype(jnp.float32)
    for dy in range(ps):
        for px in range(4):
            col = (dy * 4 + px) * 128
            f = featd[0, dy, px].astype(jnp.float32)
            if deq:
                f = f * fs[0:1, :]
            piece = g[:, col:col + 128] + bb + f
            if relu:
                piece = jnp.maximum(piece, 0.0)
            out[0, dy, px] = piece.astype(dt)


def unembed_combine_stream(tokens: jnp.ndarray, featd: jnp.ndarray,
                           kernel, bias=None, relu: bool = False,
                           feat_scale=None,
                           interpret: bool | None = None) -> jnp.ndarray:
    """patch_unembed(tokens) + featp fused, emitting deinterleave4 layout.

    tokens: (B, Ht, Wt, D); featd: (B, Ht*ps, 4, Wt, 128) — the
    deinterleave4 view of the packed feature map (Wt*ps/2 packed cols);
    kernel: (D, ps, ps, C) unembed weights (C == 64, ps == 8). Returns
    combined (B, Ht*ps, 4, G, 128) deinterleaved. Same reduction set as
    patch_unembed_packed + add (exact modulo bf16 reassociation).

    Why: the XLA formulation's 8x8 block transpose measured 2.11 ms in the
    int8 serving frame (tools/int8_stage_bench.py) for a 15 GF GEMM; here
    the scatter is free (see _unembed_kernel) and the combine add rides
    along.

    feat_scale: optional (64,) per-raw-channel scale when ``featd`` is the
    int8-quantized feature map (the int8 "tails" scope) — the skip add
    then dequantizes in-kernel (f32 q * s, exactly quantize_act_ch's
    inverse).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, ht, wt, d = tokens.shape
    dd, ps, _, c = kernel.shape
    dt = tokens.dtype
    deq = feat_scale is not None
    # Column order (dy, px, parity, ch): packed col t*4 + px holds pixels
    # (2*(t*4+px), 2*(t*4+px)+1) = patch cols px' = 8t + 2px (+1), i.e.
    # within-patch x = 2*px + parity.
    kperm = (jnp.asarray(kernel).reshape(d, ps, ps // 2, 2, c)
             .reshape(d, ps * ps * c).astype(dt))
    bp = jnp.tile(jnp.asarray(bias if bias is not None else
                              jnp.zeros((c,)), jnp.float32).reshape(1, c),
                  (1, 2))
    in_specs = [
        pl.BlockSpec((1, 1, wt, d), lambda nb, i: (nb, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ps, 4, wt, 128),
                     lambda nb, i: (nb, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        _wspec(kperm), _wspec(bp),
    ]
    args = [tokens, featd, kperm, bp]
    if deq:
        fs = jnp.tile(jnp.asarray(feat_scale, jnp.float32), 2).reshape(1, 128)
        in_specs.append(_wspec(fs))
        args.append(fs)
    out = pl.pallas_call(
        partial(_unembed_kernel, ps=ps, relu=relu, deq=deq),
        grid=(b, ht),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ps, 4, wt, 128),
                               lambda nb, i: (nb, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ht * ps, 4, wt, 128), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out


def _embed_kernel(featd, w, bias, *rest, ps, d, deq):
    """ps deinterleaved feature rows -> one token row: 4*ps contiguous
    (wt, 128) x (128, D) MXU matmuls (the transpose-free dual of
    _unembed_kernel)."""
    if deq:
        fs, out = rest
    else:
        out, = rest
    dt = out.dtype
    wt = out.shape[2]
    acc = jnp.zeros((wt, d), jnp.float32)
    for dy in range(ps):
        for px in range(4):
            row = (dy * 4 + px) * 128
            f = featd[0, dy, px]
            if deq:
                f = (f.astype(jnp.float32) * fs[0:1, :]).astype(dt)
            acc = acc + jnp.dot(f, w[row:row + 128, :],
                                preferred_element_type=jnp.float32)
    out[0, 0] = (acc + bias[0:1, :].astype(jnp.float32)).astype(dt)


def embed_stream(featd: jnp.ndarray, kernel, bias=None,
                 in_scale=None, out_dtype=None,
                 interpret: bool | None = None) -> jnp.ndarray:
    """patch_embed reading the deinterleave4 layout, no patch transpose.

    featd: (B, Ht*ps, 4, Wt, 128); kernel: (ps, ps, C, D) embed
    weights. Returns tokens (B, Ht, Wt, D). Same reduction set as
    patch_embed_packed (exact modulo bf16 reassociation and f32
    accumulation).

    in_scale: optional (64,) per-raw-channel scale when ``featd`` is
    int8-quantized (the int8 "tails" scope): the kernel dequantizes each
    tap (q * s -> compute dtype) before its GEMM, exactly matching
    quantize_act_ch's inverse followed by the bf16 embed. ``out_dtype``
    then picks the token dtype (default bfloat16 for int8 inputs).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, _, gg, _ = featd.shape
    ps, _, c, d = kernel.shape
    ht, wt = h // ps, gg
    deq = in_scale is not None
    dt = out_dtype or (jnp.bfloat16 if featd.dtype == jnp.int8
                       else featd.dtype)
    # Row order (dy, px, parity, ch), matching the deinterleaved reads.
    kperm = (jnp.asarray(kernel).reshape(ps, ps // 2, 2, c, d)
             .reshape(ps * ps * c, d).astype(dt))
    bp = jnp.asarray(bias if bias is not None else jnp.zeros((d,)),
                     jnp.float32).reshape(1, d)
    in_specs = [
        pl.BlockSpec((1, ps, 4, gg, 128),
                     lambda nb, i: (nb, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        _wspec(kperm), _wspec(bp),
    ]
    args = [featd, kperm, bp]
    if deq:
        fs = jnp.tile(jnp.asarray(in_scale, jnp.float32), 2).reshape(1, 128)
        in_specs.append(_wspec(fs))
        args.append(fs)
    out = pl.pallas_call(
        partial(_embed_kernel, ps=ps, d=d, deq=deq),
        grid=(b, ht),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, wt, d), lambda nb, i: (nb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ht, wt, d), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out


def _conv_deint_kernel(cur, above, below, w, bias, *rest, g_img,
                       rows, relu, quant):
    """3x3 conv, deinterleaved in AND out — stage 1 of _conv_tail_kernel
    as a standalone kernel (no tail, no dslab). With ``quant`` the epilogue
    rounds to int8 against a per-lane inverse scale (static calibration) —
    the activation-quant pass then costs nothing and the HBM write halves.
    """
    if quant:
        qs, out, islab = rest
    else:
        out, islab = rest
    i = pl.program_id(1)
    n = pl.num_programs(1)
    dt = out.dtype

    islab[:] = jnp.zeros_like(islab)
    islab[1:1 + rows, :, 1:1 + g_img, :] = cur[0]

    @pl.when(i > 0)
    def _():
        islab[0:1, :, 1:1 + g_img, :] = above[0, 3:4]

    @pl.when(i < n - 1)
    def _():
        islab[1 + rows:2 + rows, :, 1:1 + g_img, :] = below[0, 0:1]

    for j in range(4):
        acc = jnp.zeros((rows * g_img, 128), jnp.float32)
        for dy in range(3):
            for dj in (-1, 0, 1):
                jp = j + dj
                gshift = -1 if jp < 0 else (1 if jp > 3 else 0)
                js = jp % 4
                g0 = 1 + gshift
                piece = islab[dy:dy + rows, js, g0:g0 + g_img, :]
                acc = acc + jnp.dot(piece.reshape(rows * g_img, 128),
                                    w[dy, dj + 1],
                                    preferred_element_type=jnp.float32)
        acc = acc + bias[0:1, :].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        if quant:
            acc = jnp.clip(jnp.round(acc * qs[0:1, :]), -127, 127)
        out[0, :, j, :, :] = acc.reshape(rows, g_img, 128).astype(dt)


def conv3x3_deint_stream(xd: jnp.ndarray, kernel, bias,
                         relu: bool = False, rows: int = 16,
                         out_scale=None,
                         interpret: bool | None = None) -> jnp.ndarray:
    """conv3x3_packed_stream operating on the deinterleave4 layout.

    xd: (B, H, 4, G, 128) -> same-shape output. With the patch kernels and
    tails all reading/writing this layout, a deint-native conv removes the
    interleave4/deinterleave4 transposes around the decoder conv and after
    conv2 (~0.7 ms of pure HBM permutes on the serving frame). Same
    reduction set as conv2d_packed_raw (exact modulo bf16 reassociation).

    out_scale: optional (64,) per-raw-channel static activation scale —
    the output is then int8, quantized in the kernel epilogue
    (round(y / s), clip +-127: quantize_act_ch semantics up to the
    multiply-by-reciprocal rounding at exact ties). Used by the int8
    "tails" serving scope so the quantize pass fuses into the producer.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    env_rows = os.environ.get("TUX_CONV_ROWS")
    if env_rows is not None:  # trace-time A/B probing override
        rows = int(env_rows)
    b, h, _, g_img, _ = xd.shape
    if h % rows:
        rows = next((r for r in (16, 24, 8) if h % r == 0), 8)
    dt = xd.dtype
    quant = out_scale is not None
    odt = jnp.int8 if quant else dt
    w = pack_conv3(kernel).astype(dt)
    bp = jnp.tile(jnp.asarray(bias, jnp.float32).reshape(1, 64), (1, 2)) \
        if bias is not None else jnp.zeros((1, 128), jnp.float32)
    nr = rows // 4
    last = h // 4 - 1
    in_specs = [
        pl.BlockSpec((1, rows, 4, g_img, 128),
                     lambda nb, i: (nb, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 4, g_img, 128),
                     lambda nb, i: (nb, jnp.maximum(i * nr - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 4, g_img, 128),
                     lambda nb, i: (nb, jnp.minimum(i * nr + nr, last),
                                    0, 0, 0),
                     memory_space=pltpu.VMEM),
        _wspec(w), _wspec(bp),
    ]
    args = [xd, xd, xd, w, bp]
    if quant:
        qs = (1.0 / jnp.tile(jnp.asarray(out_scale, jnp.float32), 2)
              ).reshape(1, 128)
        in_specs.append(_wspec(qs))
        args.append(qs)
    # A/B probing hooks for Mosaic scheduling levers (the ~2x gap over
    # this kernel's HBM+MXU bound is DMA/compute overlap — see
    # PERFORMANCE.md "conv2-vs-decoder asymmetry"): TUX_DIMSEM=1 marks
    # both grid dims parallel (every row-slab is independent);
    # TUX_INPUT_FUSION=1 lets XLA fuse producers into the operands.
    cp_kw = {"vmem_limit_bytes": 100 * 1024 * 1024}
    if os.environ.get("TUX_DIMSEM") == "1":
        cp_kw["dimension_semantics"] = ("parallel", "parallel")
    if os.environ.get("TUX_INPUT_FUSION") == "1":
        cp_kw["allow_input_fusion"] = [True] * len(args)
    out = pl.pallas_call(
        partial(_conv_deint_kernel, g_img=g_img, rows=rows, relu=relu,
                quant=quant),
        grid=(b, h // rows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, 4, g_img, 128),
                               lambda nb, i: (nb, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, 4, g_img, 128), odt),
        scratch_shapes=[pltpu.VMEM((rows + 2, 4, g_img + 2, 128), dt)],
        compiler_params=pltpu.CompilerParams(**cp_kw),
        interpret=interpret,
    )(*args)
    return out


def _conv_tail_emit_kernel(cur, above, below, wc, bc, wt, bt, out, feat_out,
                           islab, dslab, *, g_img, pad_h, boff, rows,
                           conv_relu, tail_relu):
    """_conv_tail_kernel that ALSO writes the conv's interior rows as a
    second (deinterleaved) output — the encoder case: featp feeds the
    patch embed/unembed downstream."""
    _conv_tail_kernel(cur, above, below, wc, bc, wt, bt, out, islab, dslab,
                      g_img=g_img, pad_h=pad_h, boff=boff, rows=rows,
                      conv_relu=conv_relu, tail_relu=tail_relu)
    feat_out[0] = dslab[pad_h:pad_h + rows, :, 1:1 + g_img, :]


def _conv_tail_kernel(cur, above, below, wc, bc, wt, bt, out, islab, dslab,
                      *, g_img, pad_h, boff, rows, conv_relu, tail_relu):
    """3x3 conv (deinterleaved in/out, VMEM-resident) -> composed tail, one
    cell. Row/col alignment: dec row r of the cell covers image row
    i*rows - pad_h + r; its 3x3 taps read islab rows r..r+2 (islab leads by
    pad_h + 1 rows). Out-of-image dec rows are ZEROED after the conv — the
    tail must see the zero-pad of the dec FEATURE map, not conv(0)=bias."""
    i = pl.program_id(1)
    n = pl.num_programs(1)
    dt = out.dtype
    hpad = pad_h + 1
    rdec = rows + 2 * pad_h
    kh, wcols, _, nout = wt.shape
    wb = g_img

    islab[:] = jnp.zeros_like(islab)
    islab[hpad:hpad + rows, :, 1:1 + g_img, :] = cur[0]

    @pl.when(i > 0)
    def _():
        islab[0:hpad, :, 1:1 + g_img, :] = above[0, 4 - hpad:4]

    @pl.when(i < n - 1)
    def _():
        islab[hpad + rows:2 * hpad + rows, :, 1:1 + g_img, :] = \
            below[0, 0:hpad]

    dslab[:] = jnp.zeros_like(dslab)
    for j in range(4):
        acc = jnp.zeros((rdec * g_img, 128), jnp.float32)
        for dy in range(3):
            for dj in (-1, 0, 1):
                jp = j + dj
                gshift = -1 if jp < 0 else (1 if jp > 3 else 0)
                js = jp % 4
                g0 = 1 + gshift
                piece = islab[dy:dy + rdec, js, g0:g0 + g_img, :]
                acc = acc + jnp.dot(piece.reshape(rdec * g_img, 128),
                                    wc[dy, dj + 1],
                                    preferred_element_type=jnp.float32)
        acc = acc + bc[0:1, :].astype(jnp.float32)
        if conv_relu:
            acc = jnp.maximum(acc, 0.0)
        dslab[0:rdec, j, 1:1 + g_img, :] = acc.reshape(
            rdec, g_img, 128).astype(dslab.dtype)

    @pl.when(i == 0)
    def _():
        dslab[0:pad_h] = jnp.zeros_like(dslab[0:pad_h])

    @pl.when(i == n - 1)
    def _():
        dslab[rdec - pad_h:rdec] = jnp.zeros_like(dslab[rdec - pad_h:rdec])

    acc2 = jnp.zeros((rows * wb, nout), jnp.float32)
    for dy in range(kh):
        for c in range(wcols):
            rel = c - boff + 4
            g0, j = rel // 4, rel % 4
            piece = dslab[dy:dy + rows, j, g0:g0 + wb, :]
            acc2 = acc2 + jnp.dot(piece.reshape(rows * wb, 128), wt[dy, c],
                                  preferred_element_type=jnp.float32)
    acc2 = acc2 + bt[0:1, :].astype(jnp.float32)
    if tail_relu:
        acc2 = jnp.maximum(acc2, 0.0)
    out[0] = acc2.reshape(rows, wb, nout).astype(dt)


def conv3x3_tail_stream(xd: jnp.ndarray, conv_kernel, conv_bias,
                        tail_kernel, tail_bias=None,
                        conv_relu: bool = True, tail_relu: bool = False,
                        rows: int = 24, out_dtype=None,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Fused 3x3 conv + composed tail, deinterleaved end-to-end.

    xd: (B, H, 4, G, 128) deinterleaved packed input (e.g. straight from
    unembed_combine_stream — NO interleave4/deinterleave4 round trip);
    conv_kernel: (3, 3, 64, 64) raw HWIO; tail_kernel: (kh, kw, 64, co)
    composed tail, pad_h = (kh-1)/2 <= 3. Returns (B, H, G, 8*co) macro-8.

    Fusing the decoder chain kills: the interleave4 of the unembed output,
    the 118 MB dec HBM write+read between conv and tail, and the tail's
    deinterleave — ~0.9 ms of pure HBM traffic on the serving frame. Same
    reduction set as conv2d_packed_raw -> conv2d_tail_packed(block=8)
    (exact modulo bf16 reassociation); zero-pad semantics match both
    stages (the dec map is zeroed outside the image before the tail).

    out_dtype: optional override for the TAIL output dtype (the in-kernel
    conv feature slab keeps the compute dtype) — TUX_F32_TAIL support.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, _, g_img, _ = xd.shape
    if h % rows:
        rows = next((r for r in (16, 24, 8) if h % r == 0), 8)
    dt = xd.dtype
    odt = out_dtype or dt
    kh, kw, cin, co = tail_kernel.shape
    pad_h = (kh - 1) // 2
    assert pad_h <= 3, "tail taller than 7 needs a wider row halo"
    wt, boff = pack_tail_macro8(tail_kernel)
    wt = wt.astype(dt)
    wc = pack_conv3(conv_kernel).astype(dt)
    bcp = jnp.tile(jnp.asarray(conv_bias if conv_bias is not None
                               else jnp.zeros((64,)), jnp.float32)
                   .reshape(1, 64), (1, 2))
    btp = jnp.tile(
        jnp.asarray(tail_bias if tail_bias is not None else jnp.zeros((co,)),
                    jnp.float32).reshape(1, co), (1, 8))

    nr = rows // 4
    last = h // 4 - 1
    in_specs = [
        pl.BlockSpec((1, rows, 4, g_img, 128),
                     lambda nb, i: (nb, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 4, g_img, 128),
                     lambda nb, i: (nb, jnp.maximum(i * nr - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 4, g_img, 128),
                     lambda nb, i: (nb, jnp.minimum(i * nr + nr, last),
                                    0, 0, 0),
                     memory_space=pltpu.VMEM),
        _wspec(wc), _wspec(bcp), _wspec(wt), _wspec(btp),
    ]
    hpad = pad_h + 1
    out = pl.pallas_call(
        partial(_conv_tail_kernel, g_img=g_img, pad_h=pad_h, boff=boff,
                rows=rows, conv_relu=conv_relu, tail_relu=tail_relu),
        grid=(b, h // rows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, g_img, 8 * co),
                               lambda nb, i: (nb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, g_img, 8 * co), odt),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * hpad, 4, g_img + 2, 128), dt),
            pltpu.VMEM((rows + 2 * pad_h, 4, g_img + 2, 128), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xd, xd, xd, wc, bcp, wt, btp)
    return out


def conv3x3_tail_emit_stream(xd: jnp.ndarray, conv_kernel, conv_bias,
                             tail_kernel, tail_bias=None,
                             conv_relu: bool = True, tail_relu: bool = True,
                             rows: int = 24, out_dtype=None,
                             interpret: bool | None = None):
    """conv3x3_tail_stream that also returns the conv feature map.

    The encoder case: featp = conv2(feat1) feeds BOTH the branch-A tail
    (fused here) and the patch embed/unembed downstream — returned as the
    second output in deinterleave4 layout (B, H, 4, G, 128), Pallas-
    produced so every downstream Pallas consumer is a clean crossing.
    Returns (a12 macro-8 (B, H, G, 8*co), featd). ``out_dtype`` overrides
    the a12 output dtype only (featd stays the compute dtype).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, _, g_img, _ = xd.shape
    if h % rows:
        rows = next((r for r in (16, 24, 8) if h % r == 0), 8)
    dt = xd.dtype
    odt = out_dtype or dt
    kh, kw, cin, co = tail_kernel.shape
    pad_h = (kh - 1) // 2
    assert pad_h <= 3, "tail taller than 7 needs a wider row halo"
    wt, boff = pack_tail_macro8(tail_kernel)
    wt = wt.astype(dt)
    wc = pack_conv3(conv_kernel).astype(dt)
    bcp = jnp.tile(jnp.asarray(conv_bias if conv_bias is not None
                               else jnp.zeros((64,)), jnp.float32)
                   .reshape(1, 64), (1, 2))
    btp = jnp.tile(
        jnp.asarray(tail_bias if tail_bias is not None else jnp.zeros((co,)),
                    jnp.float32).reshape(1, co), (1, 8))

    nr = rows // 4
    last = h // 4 - 1
    in_specs = [
        pl.BlockSpec((1, rows, 4, g_img, 128),
                     lambda nb, i: (nb, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 4, g_img, 128),
                     lambda nb, i: (nb, jnp.maximum(i * nr - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 4, g_img, 128),
                     lambda nb, i: (nb, jnp.minimum(i * nr + nr, last),
                                    0, 0, 0),
                     memory_space=pltpu.VMEM),
        _wspec(wc), _wspec(bcp), _wspec(wt), _wspec(btp),
    ]
    hpad = pad_h + 1
    out, feat = pl.pallas_call(
        partial(_conv_tail_emit_kernel, g_img=g_img, pad_h=pad_h, boff=boff,
                rows=rows, conv_relu=conv_relu, tail_relu=tail_relu),
        grid=(b, h // rows),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, rows, g_img, 8 * co),
                         lambda nb, i: (nb, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 4, g_img, 128),
                         lambda nb, i: (nb, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, g_img, 8 * co), odt),
            jax.ShapeDtypeStruct((b, h, 4, g_img, 128), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * hpad, 4, g_img + 2, 128), dt),
            pltpu.VMEM((rows + 2 * pad_h, 4, g_img + 2, 128), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xd, xd, xd, wc, bcp, wt, btp)
    return out, feat


def _tail_kernel(cur, above, below, w, bias, out, slab, *, g_img, pad_h,
                 boff, rows, relu):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    dt = out.dtype
    kh, wcols, _, nout = w.shape
    wb = g_img  # output groups per row == image W/8

    # slab: (rows + kh - 1, 4, G + 2, 128); one zero group (4 packed cols)
    # each side covers the widest tail halo; zero rows outside the image
    # give the composed path's zero-pad semantics.
    slab[:] = jnp.zeros_like(slab)
    slab[pad_h:pad_h + rows, :, 1:1 + g_img, :] = cur[0]

    @pl.when(i > 0)
    def _():
        slab[0:pad_h, :, 1:1 + g_img, :] = above[0, 4 - pad_h:4]

    @pl.when(i < n - 1)
    def _():
        slab[pad_h + rows:2 * pad_h + rows, :, 1:1 + g_img, :] = \
            below[0, 0:pad_h]

    acc = jnp.zeros((rows * wb, nout), jnp.float32)
    for dy in range(kh):
        for c in range(wcols):
            rel = c - boff + 4  # packed col offset within the padded slab
            g0, j = rel // 4, rel % 4
            piece = slab[dy:dy + rows, j, g0:g0 + wb, :]
            acc = acc + jnp.dot(piece.reshape(rows * wb, 128), w[dy, c],
                                preferred_element_type=jnp.float32)
    acc = acc + bias[0:1, :].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out[0] = acc.reshape(rows, wb, nout).astype(dt)


def tail_macro8_stream(xt: jnp.ndarray, kernel, bias=None,
                       relu: bool = False, rows: int | None = None,
                       out_dtype=None,
                       interpret: bool | None = None) -> jnp.ndarray:
    """Composed-tail conv as macro-8 GEMMs, row-streamed.

    xt: (B, H, 4, G, 128) de-interleaved packed features (deinterleave4 of
    the conv output); kernel: raw (kh, kw, 64, co) composed tail. Returns
    (B, H, G, 8*co) macro-8 layout (reshape to (B, H, W, co) is free).
    H % rows == 0, rows % 4 == 0; pad_h = (kh-1)/2 <= 4. rows swept on
    v5e @720p (5x5/7x7): 8 -> 1.70/2.58 ms, 16 -> 1.85/2.34,
    24 -> 0.97/1.69, 48 -> 1.76/-; XLA block-8: 1.85/2.39.

    out_dtype: optional override for the OUTPUT dtype only (compute is
    bf16 GEMMs with f32 accumulation either way) — f32 output skips the
    final bf16 rounding of the branch image (TUX_F32_TAIL experiment).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kh, kw, cin, co = kernel.shape
    b, h, _, g_img, _ = xt.shape
    if rows is None:
        # Row sweep on v5e @720p (tools/conv_rows_sweep.py, same-process):
        # the 5x5 tail prefers 24 (0.97 ms), the 7x7 tail 16 (1.638 vs
        # 1.700 at 24, 2.068 at 48) — the taller halo shrinks the optimal
        # cell. TUX_TAIL_ROWS overrides both. When the preferred row count
        # doesn't divide H, fall back through the OTHER swept sizes before
        # the slowest (8): e.g. H=120/360 runs at 24, not 8.
        pref = [16, 24, 8] if kh >= 7 else [24, 16, 8]
        env = os.environ.get("TUX_TAIL_ROWS")
        if env is not None:
            rows = int(env)
        else:
            rows = next((r for r in pref if h % r == 0), 8)
    if h % rows:
        rows = 8
    dt = xt.dtype
    odt = out_dtype or dt
    pad_h = (kh - 1) // 2
    w, boff = pack_tail_macro8(kernel)
    w = w.astype(dt)
    # Bias stays f32: the kernel epilogue adds it at f32 anyway, and the
    # composed-tail biases carry summed composition terms whose bf16
    # rounding would be a systematic offset on every output pixel.
    bp = jnp.tile(
        jnp.asarray(bias if bias is not None else jnp.zeros((co,)),
                    jnp.float32).reshape(1, co), (1, 8))

    nr = rows // 4
    last = h // 4 - 1
    in_specs = [
        pl.BlockSpec((1, rows, 4, g_img, 128),
                     lambda nb, i: (nb, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 4, g_img, 128),
                     lambda nb, i: (nb, jnp.maximum(i * nr - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 4, g_img, 128),
                     lambda nb, i: (nb, jnp.minimum(i * nr + nr, last),
                                    0, 0, 0),
                     memory_space=pltpu.VMEM),
        _wspec(w), _wspec(bp),
    ]
    out = pl.pallas_call(
        partial(_tail_kernel, g_img=g_img, pad_h=pad_h, boff=boff,
                rows=rows, relu=relu),
        grid=(b, h // rows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, g_img, 8 * co),
                               lambda nb, i: (nb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, g_img, 8 * co), odt),
        scratch_shapes=[pltpu.VMEM((rows + 2 * pad_h, 4, g_img + 2, 128),
                                   dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, xt, xt, w, bp)
    return out


def _tail_int8_kernel(cur, above, below, w, scale, bias, out, slab, *,
                      g_img, pad_h, boff, rows, relu):
    """_tail_kernel with int8 x int8 -> int32 MXU dots (same tap set)."""
    i = pl.program_id(1)
    n = pl.num_programs(1)
    dt = out.dtype
    kh, wcols, _, nout = w.shape
    wb = g_img

    slab[:] = jnp.zeros_like(slab)
    slab[pad_h:pad_h + rows, :, 1:1 + g_img, :] = cur[0]

    @pl.when(i > 0)
    def _():
        slab[0:pad_h, :, 1:1 + g_img, :] = above[0, 4 - pad_h:4]

    @pl.when(i < n - 1)
    def _():
        slab[pad_h + rows:2 * pad_h + rows, :, 1:1 + g_img, :] = \
            below[0, 0:pad_h]

    acc = jnp.zeros((rows * wb, nout), jnp.int32)
    for dy in range(kh):
        for c in range(wcols):
            rel = c - boff + 4
            g0, j = rel // 4, rel % 4
            piece = slab[dy:dy + rows, j, g0:g0 + wb, :]
            acc = acc + jnp.dot(piece.reshape(rows * wb, 128), w[dy, c],
                                preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale[0:1, :] + bias[0:1, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out[0] = y.reshape(rows, wb, nout).astype(dt)


def tail_macro8_stream_int8(xq: jnp.ndarray, kernel, x_scale, bias=None,
                            relu: bool = False, out_dtype=jnp.bfloat16,
                            rows: int = 24,
                            interpret: bool | None = None) -> jnp.ndarray:
    """tail_macro8_stream with int8 MXU compute (int8 x int8 -> int32).

    xq: (B, H, 4, G, 128) int8 deinterleaved features, pre-quantized per
    RAW channel with ``x_scale`` (64,) — e.g. emitted directly by
    ``conv3x3_deint_stream(out_scale=...)``. kernel: raw float
    (kh, kw, 64, co) composed tail. The activation scale folds into the
    kernel before per-output-channel weight quantization (the exact
    reduction set of ops/conv.conv2d_tail_packed_int8 at block=8, modulo
    f32 epilogue reassociation).

    Why: the composed tails' macro-8 lane-filling inflates MACs 3.2-3.9x;
    bf16 pays it (Pallas 0.97/1.69 ms for the 5x5/7x7 tails @720p) while
    int8's doubled MXU rate absorbs it — and unlike the XLA int8 conv
    (0.38/0.29 ms standalone) this kernel's input is a Pallas/dot-layout
    tensor, so no conv-emitter relayout poison (PERFORMANCE.md crossing
    rule).
    """
    from transformerupscaler_tpu.ops.quant import quantize_conv_kernel

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, _, g_img, _ = xq.shape
    if h % rows:
        rows = 8
    kh, kw, cin, co = kernel.shape
    pad_h = (kh - 1) // 2
    keff = (jnp.asarray(kernel, jnp.float32)
            * jnp.asarray(x_scale, jnp.float32).reshape(1, 1, -1, 1))
    kq, ks = quantize_conv_kernel(keff)
    # pack_tail_macro8 only repacks +-127 integer entries and zero-fills,
    # so the int8 round-trip through the packer is lossless.
    w, boff = pack_tail_macro8(kq)
    w = w.astype(jnp.int8)
    sc = jnp.tile(ks.reshape(1, co), (1, 8)).astype(jnp.float32)
    bp = jnp.tile(
        jnp.asarray(bias if bias is not None else jnp.zeros((co,)),
                    jnp.float32).reshape(1, co), (1, 8))

    nr = rows // 4
    last = h // 4 - 1
    in_specs = [
        pl.BlockSpec((1, rows, 4, g_img, 128),
                     lambda nb, i: (nb, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 4, g_img, 128),
                     lambda nb, i: (nb, jnp.maximum(i * nr - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 4, g_img, 128),
                     lambda nb, i: (nb, jnp.minimum(i * nr + nr, last),
                                    0, 0, 0),
                     memory_space=pltpu.VMEM),
        _wspec(w), _wspec(sc), _wspec(bp),
    ]
    out = pl.pallas_call(
        partial(_tail_int8_kernel, g_img=g_img, pad_h=pad_h, boff=boff,
                rows=rows, relu=relu),
        grid=(b, h // rows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, g_img, 8 * co),
                               lambda nb, i: (nb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, g_img, 8 * co), out_dtype),
        scratch_shapes=[pltpu.VMEM((rows + 2 * pad_h, 4, g_img + 2, 128),
                                   jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xq, xq, xq, w, sc, bp)
    return out


def pack_finish_macro8(kernel) -> jnp.ndarray:
    """(3, 3, cm, co) finish conv -> (3, 3, 8*cm, 8*co) macro-8 weights.

    The finish (the commuted RGB tail of the split branch-B routing,
    models/upsampler.split_tail_kernels) reads the mid tensor in macro-8
    layout: output pixel s of a block taps mid pixels s+dx0-1, which live
    in macro block b-1 (slot 7), b (slots 0..7) or b+1 (slot 0) — so one
    (8*cm, 8*co) GEMM per (dy, neighbor-block) covers all eight pixels.
    """
    kh, kw, cm, co = kernel.shape
    assert (kh, kw) == (3, 3)
    kp = jnp.zeros((3, 3, 8 * cm, 8 * co), jnp.float32)
    kn = jnp.asarray(kernel, jnp.float32)
    for s in range(8):
        for dx0 in range(3):
            t = s + dx0 - 1
            blk = (t // 8) + 1
            slot = t % 8
            kp = kp.at[:, blk, slot * cm:(slot + 1) * cm,
                       s * co:(s + 1) * co].add(kn[:, dx0])
    return kp


def _tail_finish_kernel(cur, above, below, wm, bm, wf, bf, out, slab, *,
                        g_img, boff, rows, h_img, hi_lo_fin):
    # hi_lo_fin: "off" = bf16 mid @ bf16 weights (9 dots);
    # "wf" = bf16 mid @ exact [hi|lo] weights (9 N-doubled dots — kills
    # the STRUCTURED finish-weight rounding, keeps the mid's one
    # unstructured image rounding); "full" = also hi/lo the mid (+9 dots,
    # nothing rounds at all).
    """Split branch-B tail fused: the 5x5 mid conv's (rows+2) rows stay in
    VMEM as a value and the 3x3 finish applies in-kernel — the mid tensor
    (the XLA-finish split's 0.45 ms + its Pallas->conv-emitter boundary)
    never touches HBM. Zero-pad semantics of the sequential two-conv form:
    the input slab zero-pads the mid conv; mid rows/blocks outside the
    image are ZEROED (not bias-filled) before the finish, matching the
    finish's own zero-pad."""
    i = pl.program_id(1)
    n = pl.num_programs(1)
    dt = out.dtype
    kh, wcols, _, ncm = wm.shape  # ncm = 8*cm
    nco = wf.shape[3]             # 8*co
    wb = g_img

    slab[:] = jnp.zeros_like(slab)
    slab[3:3 + rows, :, 1:1 + g_img, :] = cur[0]

    @pl.when(i > 0)
    def _():
        slab[0:3, :, 1:1 + g_img, :] = above[0, 1:4]

    @pl.when(i < n - 1)
    def _():
        slab[3 + rows:6 + rows, :, 1:1 + g_img, :] = below[0, 0:3]

    rmid = rows + 2
    roff = 2 - (kh - 1) // 2  # slab rows 0..2 are halo; a 3x3 mid skips 1
    acc = jnp.zeros((rmid * wb, ncm), jnp.float32)
    for dy in range(kh):
        for c in range(wcols):
            rel = c - boff + 4
            g0, j = rel // 4, rel % 4
            piece = slab[roff + dy:roff + dy + rmid, j, g0:g0 + wb, :]
            acc = acc + jnp.dot(piece.reshape(rmid * wb, 128), wm[dy, c],
                                preferred_element_type=jnp.float32)
    acc = acc + bm[0:1, :].astype(jnp.float32)
    # Mid rows outside the image (the finish's row halo at the top/bottom
    # cells) are zero in the sequential form.
    row = (jax.lax.broadcasted_iota(jnp.int32, (rmid * wb, 1), 0) // wb
           + i * rows - 1)
    valid = (row >= 0) & (row < h_img)
    mid32 = jnp.where(valid, acc, 0.0).reshape(rmid, wb, ncm)
    mid_hi = mid32.astype(jnp.bfloat16)
    if hi_lo_fin == "full":
        # hi/lo BOTH finish operands so the split form loses nothing vs
        # the fold: the f32 mid (its bf16 rounding is one extra image
        # rounding the fold doesn't have) AND the f32 finish weights (the
        # fold rounds ONE composed kernel; a separately-rounded finish
        # would be a second weight-rounding term). K-concat form: the
        # mid slab is [hi | lo] along channels and the packed weight is
        # [[w_hi | w_lo], [w_hi | 0]] along K, so ONE dot per (dy, blk)
        # carries all three exact product terms (hi*hi, hi*lo, lo*hi;
        # lo*lo dropped, ~2^-17) — same 9-dot count as "wf" at 2x the K,
        # vs the first implementation's 18 small dots (+1 ms in-model).
        mid_lo = (mid32 - mid_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        mid_cat = jnp.concatenate([mid_hi, mid_lo], axis=-1)
    else:
        mid_cat = mid_hi
    kdim = mid_cat.shape[-1]
    zpad = jnp.zeros((rmid, 1, kdim), jnp.bfloat16)
    midp = jnp.concatenate([zpad, mid_cat, zpad], axis=1)
    if hi_lo_fin != "off":
        nco = nco // 2

    acc2 = jnp.zeros((rows * wb, nco), jnp.float32)
    for dy in range(3):
        for blk in range(3):
            piece = midp[dy:dy + rows, blk:blk + wb, :]
            if hi_lo_fin != "off":
                y2 = jnp.dot(piece.reshape(rows * wb, kdim), wf[dy, blk],
                             preferred_element_type=jnp.float32)
                acc2 = acc2 + y2[:, :nco] + y2[:, nco:]
            else:
                acc2 = acc2 + jnp.dot(piece.reshape(rows * wb, kdim),
                                      wf[dy, blk],
                                      preferred_element_type=jnp.float32)
    acc2 = acc2 + bf[0:1, :].astype(jnp.float32)
    out[0] = acc2.reshape(rows, wb, nco).astype(dt)


def tail_finish_stream(xt: jnp.ndarray, k_mid, b_mid, k_fin, b_fin,
                       rows: int | None = None, out_dtype=None,
                       hi_lo_fin: str = "wf",
                       interpret: bool | None = None) -> jnp.ndarray:
    """Fused split branch-B tail: macro-8 [pre o stage] conv (<=5x5,
    64 -> cm) + in-VMEM 3x3 finish (cm -> co, the commuted RGB tail).

    xt: (B, H, 4, G, 128) de-interleaved packed features. Returns
    (B, H, G, 8*co) macro-8. Same interior math as the composed 7x7 fold
    at half (x2/x3) to a sixth (x4) of its MACs; the border ring follows
    the sequential two-conv zero-pad (split_tail_kernels docstring). The
    XLA-finish split measured no win (1.78 vs 1.87 composed at x2: the
    block-8 conv-emitter finish alone costs 0.45 ms); fusing keeps the
    mid off HBM entirely. ``hi_lo_fin`` selects the finish-dot rounding:
    "off" rounds the f32 mid AND the f32 finish weights to bf16 (the
    mid's single rounding measured +0.011 dB GT); "wf" (default) keeps
    the finish WEIGHTS exact via in-kernel hi/lo dots ([hi | lo] along N
    — bf16*bf16 products are exact in the f32 accumulator) but still
    rounds the mid once; "full" hi/lo's the mid too (K-concat, lo*lo
    dropped at ~2^-17) and alone loses nothing vs the composed fold —
    at ~+0.6 ms even in the K-concat form (tools/hilo_bench.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kh, kw, cin, cm = k_mid.shape
    assert (kh - 1) // 2 <= 2, "mid conv taller than the 3-row halo"
    co = k_fin.shape[3]
    b, h, _, g_img, _ = xt.shape
    if rows is None:
        env = os.environ.get("TUX_TAIL_ROWS")
        if env is not None:
            rows = int(env)
        else:
            rows = next((r for r in (24, 16, 8) if h % r == 0), 8)
    if h % rows:
        rows = 8
    dt = xt.dtype
    odt = out_dtype or dt
    wm, boff = pack_tail_macro8(k_mid)
    wm = wm.astype(dt)
    env = os.environ.get("TUX_HILO_FIN")
    if env is not None:
        if env != str(hi_lo_fin):
            # A leftover env var from a bench session (tools/hilo_bench.py)
            # would otherwise silently change serve_quality numerics now
            # that fast_transformer passes a quality-dependent explicit
            # mode.
            import warnings

            warnings.warn(
                f"TUX_HILO_FIN={env!r} overrides the explicitly passed "
                f"hi_lo_fin={hi_lo_fin!r} for tail_finish_stream",
                stacklevel=2)
        hi_lo_fin = env
    if hi_lo_fin is True:
        hi_lo_fin = "full"
    elif hi_lo_fin is False:
        hi_lo_fin = "off"
    assert hi_lo_fin in ("off", "wf", "full"), hi_lo_fin
    wf32 = pack_finish_macro8(k_fin)
    if hi_lo_fin != "off":
        wf_hi = wf32.astype(jnp.bfloat16)
        wf_lo = (wf32 - wf_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        wf = jnp.concatenate([wf_hi, wf_lo], axis=3)
        if hi_lo_fin == "full":
            # K-doubled: top K rows multiply mid_hi by [w_hi | w_lo],
            # bottom K rows multiply mid_lo by [w_hi | 0] (lo*lo dropped).
            wf = jnp.concatenate(
                [wf, jnp.concatenate([wf_hi, jnp.zeros_like(wf_hi)],
                                     axis=3)], axis=2)
    else:
        wf = wf32.astype(jnp.bfloat16)
    bmp = jnp.tile(jnp.asarray(
        b_mid if b_mid is not None else jnp.zeros((cm,)),
        jnp.float32).reshape(1, cm), (1, 8))
    bfp = jnp.tile(jnp.asarray(
        b_fin if b_fin is not None else jnp.zeros((co,)),
        jnp.float32).reshape(1, co), (1, 8))

    nr = rows // 4
    last = h // 4 - 1
    in_specs = [
        pl.BlockSpec((1, rows, 4, g_img, 128),
                     lambda nb, i: (nb, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 4, g_img, 128),
                     lambda nb, i: (nb, jnp.maximum(i * nr - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, 4, g_img, 128),
                     lambda nb, i: (nb, jnp.minimum(i * nr + nr, last),
                                    0, 0, 0),
                     memory_space=pltpu.VMEM),
        _wspec(wm), _wspec(bmp), _wspec(wf), _wspec(bfp),
    ]
    out = pl.pallas_call(
        partial(_tail_finish_kernel, g_img=g_img, boff=boff, rows=rows,
                h_img=h, hi_lo_fin=hi_lo_fin),
        grid=(b, h // rows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, g_img, 8 * co),
                               lambda nb, i: (nb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, g_img, 8 * co), odt),
        scratch_shapes=[pltpu.VMEM((rows + 6, 4, g_img + 2, 128), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, xt, xt, wm, bmp, wf, bfp)
    return out


def conv1_im2col(xp: jnp.ndarray) -> jnp.ndarray:
    """Width-and-row tap expansion for ``conv1_dots_stream``.

    xp: (B, H, W/2, 2*cin) width-2-packed image. Returns
    (B, H, G, 18*2cin) with G = W/8 groups and lane index
    [dy(3), p(6), c(2cin)] — p walks the SIX packed columns 4g-1..4g+4
    that the four j-outputs of group g collectively tap (output j reads
    the contiguous p range [j, j+2]).

    Why this exists: the XLA im2col of conv2d_packed_dots_deint
    materializes (B, H, 4, G, 54), whose 54-lane minor dim pads to 128
    in TPU tiled layouts — ~118 MB physical at 720p, read and written
    once each. This layout keeps ONE copy of each tap per GROUP rather
    than per output column (36 values per (r, g) per dy instead of
    4x54), so K=108 <= 128 lanes: the lane padding that bloated the old
    intermediate is absorbed by data we were padding anyway — ~30 MB
    physical at 720p, and the kernel-side dot reads it with zero
    in-kernel shuffles.
    """
    b, h, wp2, c2i = xp.shape
    g = wp2 // 4
    u = 4 * c2i  # flat values per group per row
    # The group window [4g-1 .. 4g+4] x c2i is a CONTIGUOUS slice of the
    # flattened row (width-2 packing preserves raw (w, c) order), so
    # every piece is a pure reshape of one padded flat array — no
    # narrow-minor intermediates for XLA to relayout. Row taps are baked
    # in (rows +-1): no halo logic in the kernel.
    xf = jnp.pad(xp.reshape(b, h, wp2 * c2i),
                 ((0, 0), (1, 1), (c2i, 3 * c2i)))
    parts = []
    for dy in range(3):
        r = xf[:, dy:dy + h]
        # p in 0..3: cols 4g-1..4g+2 (flat offsets u*g .. u*g + u-1
        # after the c2i left pad).
        parts.append(r[:, :, :u * g].reshape(b, h, g, u))
        # p in 4..5: cols 4g+3, 4g+4 (flat offsets u*g + u .. + u/2).
        parts.append(r[:, :, u:u * (g + 1)].reshape(b, h, g, u)
                     [..., :u // 2])
    return jnp.concatenate(parts, axis=-1)


def pack_conv1_dots(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, cin, cout) HWIO -> (18*2cin, 4*2cout) for conv1_dots_stream.

    Row index matches conv1_im2col's lane order [dy, p, c]; column index
    is [j(4), 2cout] so the kernel's one dot emits all four deint output
    planes as aligned 128-lane slices. Taps a given j does not use stay
    exactly zero — f32 accumulation of zeros is an identity, so the
    reduction VALUE matches conv2d_packed_dots_deint's K=54 per-j dot.
    """
    from transformerupscaler_tpu.ops.conv import pack_kernel_width2

    kh, kw, cin, cout = kernel.shape
    assert kh == 3 and kw == 3, "conv1_dots_stream is 3x3-specific"
    kp = pack_kernel_width2(kernel.astype(jnp.float32))  # (3, 3, 2cin, 2cout)
    c2i, c2o = kp.shape[2], kp.shape[3]
    wf = jnp.zeros((3, 6, c2i, 4, c2o), jnp.float32)
    for j in range(4):
        for jc in range(3):
            # Output column j, width tap jc reads packed col 4g + (j+jc-1)
            # = window position p = j + jc (conv2d_packed_dots_deint's
            # t = j + jc + jmin with jmin = -1).
            wf = wf.at[:, j + jc, :, j, :].set(kp[:, jc])
    return wf.reshape(18 * c2i, 4 * c2o)


def _conv1_kernel(im, w, bias, out, *, g_img, rows, k, c2o, relu):
    dt = out.dtype
    a = im[0].reshape(rows * g_img, k)
    acc = jnp.dot(a, w[:, :], preferred_element_type=jnp.float32)
    # Bit-order parity with conv2d_packed_dots_deint: round the f32
    # accumulator to dt FIRST, then bias + relu in dt arithmetic.
    y = acc.astype(dt) + bias[0:1, :].astype(dt)
    if relu:
        y = jnp.maximum(y, jnp.zeros((), dt))
    for j in range(4):
        out[0, :, j, :, :] = (y[:, j * c2o:(j + 1) * c2o]
                              .reshape(rows, g_img, c2o))


def conv1_dots_stream(xp: jnp.ndarray, kernel, bias=None,
                      relu: bool = False, rows: int = 16,
                      interpret: bool | None = None) -> jnp.ndarray:
    """conv2d_packed_dots_deint as [tiny XLA tap expansion] + [one-dot
    Pallas row stream] — the bandwidth-floor conv1.

    xp: (B, H, W/2, 2*cin) packed; kernel (3, 3, cin, cout) HWIO raw.
    Returns the deinterleave4 layout (B, H, 4, G, 2*cout), same reduction
    set and dt rounding order as conv2d_packed_dots_deint (exact modulo
    MXU pass splitting over the zero-padded K).

    Motivation (round-5 stage budget, PERFORMANCE.md): conv1 measured
    0.535 ms at 3.0% MFU — ~3.6x its ~0.15 ms HBM floor — because the
    XLA im2col's (.., 54) intermediate pads to 128 lanes (~118 MB
    physical, written + read). Here the intermediate is per-GROUP
    (conv1_im2col, ~30 MB physical) and the kernel does one
    (rows*G, 108) x (108, 512) MXU dot per slab, writing the 118 MB
    deint output directly. Parity target: the conv1+conv2 encoder of
    /root/reference/models/FastTransformer/model.py (via the packed
    serving decomposition, ops/conv.py).

    OUTCOME (round 5): ARCHIVED measured rejection — the paired
    in-model A/B loses 0.07-0.6 ms to the XLA dots conv1
    (tools/conv1_model_ab.py; ops/pallas/README.md has the full
    post-mortem). Kept opt-in via the FastTransformer ``conv1_stream``
    field / TUX_CONV1_STREAM=1.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert xp.shape[2] % 4 == 0, "width must pack to whole deint groups"
    kh, kw, cin, cout = kernel.shape
    w = pack_conv1_dots(kernel).astype(xp.dtype)
    bias_v = (jnp.asarray(bias, jnp.float32) if bias is not None
              else jnp.zeros((cout,), jnp.float32))
    bp = jnp.tile(bias_v.reshape(1, cout), (1, 8))  # [j(4) x doubled cout]
    return conv1_stream_call(conv1_im2col(xp), w, bp, relu=relu,
                             rows=rows, interpret=interpret)


def conv1_stream_call(im: jnp.ndarray, w, bp, relu: bool = False,
                      rows: int = 16,
                      interpret: bool | None = None) -> jnp.ndarray:
    """The Pallas half of conv1_dots_stream: im from conv1_im2col, w from
    pack_conv1_dots (cast to im.dtype), bp the (1, 8*cout) tiled bias.
    Split out so tools/conv1_bench.py can pin the kernel's cost apart
    from the tap expansion's."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    env_rows = os.environ.get("TUX_CONV1_ROWS")
    if env_rows is not None:
        rows = int(env_rows)
    b, h, g_img, k = im.shape
    if h % rows:
        rows = next((r for r in (16, 24, 8) if h % r == 0), 8)
    dt = im.dtype
    c2o = w.shape[1] // 4
    out = pl.pallas_call(
        partial(_conv1_kernel, g_img=g_img, rows=rows, k=k, c2o=c2o,
                relu=relu),
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec((1, rows, g_img, k), lambda nb, i: (nb, i, 0, 0),
                         memory_space=pltpu.VMEM),
            _wspec(w), _wspec(bp),
        ],
        out_specs=pl.BlockSpec((1, rows, 4, g_img, c2o),
                               lambda nb, i: (nb, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, 4, g_img, c2o), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(im, w.astype(dt), bp)
    return out


def _conv1_flat_kernel(cur, above, below, w, bias, out, slab, a, *,
                       g_img, rows, u, k, c2o, relu):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    dt = out.dtype

    slab[:] = jnp.zeros_like(slab)
    slab[1:1 + rows] = cur[0]

    # above/below are 8-row-granular blocks (the Pallas TPU sublane
    # constraint); only one boundary row of each is used.
    @pl.when(i > 0)
    def _():
        slab[0:1] = above[0, 7:8]

    @pl.when(i < n - 1)
    def _():
        slab[1 + rows:] = below[0, 0:1]

    # Lane -> (group sublane, lane) relayout of the flat rows, then six
    # masked VMEM copies assemble the same (M, K) im2col operand that
    # conv1_im2col builds in XLA — but at VMEM speeds, overlapped with
    # the dots, with only the 5.6 MB flat input ever touching HBM.
    rr = slab[:].reshape(rows + 2, g_img + 1, u)
    s = u + u // 2  # per-dy K stride (36 for cin=3)
    for dy in range(3):
        base = rr[dy:dy + rows]
        a[:, dy * s:dy * s + u] = base[:, :g_img].reshape(
            rows * g_img, u)
        a[:, dy * s + u:dy * s + s] = base[:, 1:g_img + 1, :u // 2] \
            .reshape(rows * g_img, u // 2)
    acc = jnp.dot(a[:, :], w[:, :], preferred_element_type=jnp.float32)
    y = acc.astype(dt) + bias[0:1, :].astype(dt)
    if relu:
        y = jnp.maximum(y, jnp.zeros((), dt))
    for j in range(4):
        out[0, :, j, :, :] = (y[:, j * c2o:(j + 1) * c2o]
                              .reshape(rows, g_img, c2o))


def conv1_flat_stream(xp: jnp.ndarray, kernel, bias=None,
                      relu: bool = False, rows: int = 8,
                      interpret: bool | None = None) -> jnp.ndarray:
    """conv1_dots_stream v2: the im2col assembly moves INTO the kernel.

    v1's XLA-side conv1_im2col measured ~0 fused but ~0.33 ms when
    materialized for the pallas boundary (the 108-lane minor dim makes
    every store a masked sub-vreg write). Here the kernel reads the
    flattened padded rows (B, H, W*C + pad) — minor dim ~3.9k, clean
    tiles, 5.6 MB at 720p — and builds the (M, 108) operand in VMEM.
    Same single K=108 dot and epilogue as v1: bit-exact vs
    conv2d_packed_dots_deint.

    DEAD ON TPU (round 5): Mosaic rejects the in-kernel lane->sublane
    relayout `(rows, 3864) -> (rows, 161, 24)` with "infer-vector-
    layout: unsupported shape cast" — the narrow-channel transpose
    cannot be hidden in VMEM. Interpret-mode correct (tested); kept as
    the executable record of why the streaming-conv1 lead is closed
    (ops/pallas/README.md).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, wp2, c2i = xp.shape
    assert wp2 % 4 == 0, "width must pack to whole deint groups"
    g_img = wp2 // 4
    if h % rows:
        rows = next((r for r in (8, 16, 24) if h % r == 0), 8)
    assert rows % 8 == 0, "8-row-granular halo blocks"
    dt = xp.dtype
    kh, kw, cin, cout = kernel.shape
    c2o = 2 * cout
    u = 4 * c2i
    k = 18 * c2i
    w = pack_conv1_dots(kernel).astype(dt)
    bias_v = (jnp.asarray(bias, jnp.float32) if bias is not None
              else jnp.zeros((cout,), jnp.float32))
    bp = jnp.tile(bias_v.reshape(1, cout), (1, 8))
    # Flat rows with one group of left pad (c2i lanes = packed col -1)
    # and right pad to a whole (g_img + 1) * u lanes.
    w3 = (g_img + 1) * u
    xf = jnp.pad(xp.reshape(b, h, wp2 * c2i),
                 ((0, 0), (0, 0), (c2i, w3 - wp2 * c2i - c2i)))
    out = pl.pallas_call(
        partial(_conv1_flat_kernel, g_img=g_img, rows=rows, u=u, k=k,
                c2o=c2o, relu=relu),
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec((1, rows, w3), lambda nb, i: (nb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w3),
                         lambda nb, i, nr=rows // 8:
                         (nb, jnp.maximum(i * nr - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w3),
                         lambda nb, i, nr=rows // 8, last=h // 8 - 1:
                         (nb, jnp.minimum(i * nr + nr, last), 0),
                         memory_space=pltpu.VMEM),
            _wspec(w), _wspec(bp),
        ],
        out_specs=pl.BlockSpec((1, rows, 4, g_img, c2o),
                               lambda nb, i: (nb, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, 4, g_img, c2o), dt),
        scratch_shapes=[pltpu.VMEM((rows + 2, w3), dt),
                        pltpu.VMEM((rows * g_img, k), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xf, xf, xf, w, bp)
    return out
