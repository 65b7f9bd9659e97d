"""Thin NHWC conv wrapper over lax.conv_general_dilated.

XLA lowers these 3x3 convs straight onto the MXU; explicit padding keeps
output-size semantics identical to PyTorch's ``padding=1`` (flax SAME padding
differs for stride 2).
"""

import os

import jax
import jax.numpy as jnp
from jax import lax

# Kill-switches for A/B isolation benchmarks (read at trace time):
#   TUX_CONV_MACRO=0   disable the small-O macro routing
#   TUX_CONV_PACKED=0  disable the width-2-packed 64->64 routing


def _env_on(name: str, default: str = "1") -> bool:
    return os.environ.get(name, default) not in ("0", "false")


def _macro_block(width: int, out_ch: int) -> int:
    """Largest horizontal block so block*out_ch fills (but doesn't exceed)
    the 128 MXU lanes and divides the image width."""
    best = 1
    b = 128 // out_ch
    while b > 1:
        if width % b == 0:
            best = b
            break
        b -= 1
    return best


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
           stride: int = 1, padding: int = 1, relu: bool = False,
           auto_macro: bool = True) -> jnp.ndarray:
    """x: NHWC; kernel: HWIO.

    No ``preferred_element_type``: the MXU accumulates in f32 internally
    either way, and requesting an f32 output measured ~3x slower on v5e than
    letting the conv emit the input dtype directly (see tools/op_bench2.py).

    Small-output-channel convs (O <= 16: the RGB tails and commuted
    pixel-shuffle tails) route through the exact macro formulation
    (conv2d_macro) — XLA pads conv output channels to 128 lanes, so e.g. the
    5x5 64->12 composed tail measured 5.3 ms direct vs 2.4 ms macro on v5e.
    """
    o = kernel.shape[3]
    if (auto_macro and _env_on("TUX_CONV_MACRO") and stride == 1 and o <= 16
            and kernel.shape[0] == kernel.shape[1]
            and kernel.shape[0] == 2 * padding + 1):
        block = _macro_block(x.shape[2], o)
        if block > 1:
            return conv2d_macro(x, kernel, bias, padding=padding, relu=relu,
                                block=block)
    if (auto_macro and _env_on("TUX_CONV_PACKED", default="0") and stride == 1
            and padding == 1 and kernel.shape[:2] == (3, 3)
            and kernel.shape[2] == 64 and o == 64 and x.shape[2] % 2 == 0):
        # Off by default: wins standalone (1.84 vs 2.49 ms on v5e) but the
        # reshape boundaries break XLA fusion in-context (22.7 vs 19.8 ms
        # full-model, tools/serve_bench.py). The packed formulation lives on
        # inside the Pallas kernels (ops/pallas/encoder.py) where it pays off.
        return conv2d_packed2(x, kernel, bias, relu=relu)
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=dn,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    if relu:
        out = jax.nn.relu(out)
    return out


def pack_kernel_width2(kernel: jnp.ndarray) -> jnp.ndarray:
    """(kh, kw, Cin, Cout) HWIO -> (kh, (kw+3)//2+..., 2Cin, 2Cout) width-2
    packed kernel for same-pad odd-width convs (exact; extra slots zero).

    Output pixel 2*w2+pxo at packed col w2 takes input pixel 2*(w2+Xp-off)+pxi
    at tap dx = 2*(Xp-off) + pxi - pxo + ... (see loop); ``off`` packed cols
    of zero padding on each side cover the pixel-domain halo.
    """
    kh, kw, cin, cout = kernel.shape
    pad = (kw - 1) // 2
    # tap dx in [-pad, pad]; out pixel = 2*c0 + pxo (c0 = center packed
    # col); input pixel 2*c0 + pxo + dx -> packed col c0 + floor((pxo+dx)/2),
    # parity (pxo+dx) % 2.
    jmin = (0 - pad) // 2  # floor over pxo in {0,1}, dx in [-pad, pad]
    jmax = (1 + pad) // 2
    kwp = jmax - jmin + 1
    kp = jnp.zeros((kh, kwp, 2 * cin, 2 * cout), kernel.dtype)
    for pxo in range(2):
        for dx in range(-pad, pad + 1):
            t = pxo + dx
            j = (t - (t % 2)) // 2 - jmin  # floor division for negatives
            pxi = t % 2
            kp = kp.at[:, j, pxi * cin:(pxi + 1) * cin,
                       pxo * cout:(pxo + 1) * cout].add(kernel[:, dx + pad])
    return kp


def conv2d_packed_dots(xp: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray | None = None,
                       relu: bool = False,
                       deint_out: bool = False) -> jnp.ndarray:
    """conv2d_packed_raw as im2col + ONE dot (same reduction set, exact).

    Built for SMALL Cin (conv1: 3 raw channels -> K = kh*kwp*6): the
    shifted-slice im2col materializes (B, H, W/2, K) once, then a single
    (M, K) x (K, 2Cout) GEMM. Measured v5e @720p conv1: 0.48 ms vs 0.80
    conv-emitter — and, critically, the dot's output layout is DEFAULT, so
    downstream Pallas kernels don't pay the conv-emitter's 2.6-12 ms
    relayout at the custom-call boundary (tools/int8_pallas_iso4.py). Do
    NOT use for Cin=64 convs: the 9x input duplication is ~1 GB of HBM
    traffic there.
    """
    b, h, wp2, _ = xp.shape
    kh, kw, cin, cout = kernel.shape
    pad_h = (kh - 1) // 2
    pad = (kw - 1) // 2
    jmin, jmax = (0 - pad) // 2, (1 + pad) // 2
    kp = pack_kernel_width2(kernel).astype(xp.dtype)
    khp, kwp, c2i, c2o = kp.shape
    xpad = jnp.pad(xp, ((0, 0), (pad_h, pad_h), (-jmin, jmax), (0, 0)))
    cols = [xpad[:, dy:dy + h, j:j + wp2, :]
            for dy in range(khp) for j in range(kwp)]
    im = jnp.concatenate(cols, axis=-1)
    km = kp.reshape(khp * kwp * c2i, c2o)
    if deint_out:
        # Emit the deinterleave4 layout (B, H, 4, W/8, 128) directly: four
        # strided-column GEMMs instead of one GEMM + a 118 MB transpose —
        # the Pallas deint-native pipeline consumes this with zero layout
        # ops anywhere in the path.
        out = jnp.stack(
            [jnp.einsum("bhwk,ko->bhwo", im[:, :, j::4, :], km,
                        preferred_element_type=jnp.float32).astype(xp.dtype)
             for j in range(4)], axis=2)
    else:
        out = jnp.einsum("bhwk,ko->bhwo", im, km,
                         preferred_element_type=jnp.float32).astype(xp.dtype)
    if bias is not None:
        out = out + jnp.tile(bias.astype(xp.dtype), 2)
    if relu:
        out = jax.nn.relu(out)
    return out


def conv2d_packed_dots_deint(xp: jnp.ndarray, kernel: jnp.ndarray,
                             bias: jnp.ndarray | None = None,
                             relu: bool = False,
                             hi_lo: bool = False,
                             k_hi_lo: bool = False,
                             pre_scale: float | None = None,
                             out_dtype=None) -> jnp.ndarray:
    """conv2d_packed_dots emitting the deinterleave4 layout with NO large
    transpose: the (tiny, 5.5 MB at 720p) INPUT is deinterleaved instead,
    and the conv becomes four contiguous-slice im2col GEMMs — one per
    within-group column j — each writing its (B, H, G, 2Cout) plane of the
    (B, H, 4, G, 2Cout) output directly.

    This replaced ``conv2d_packed_dots(...) + deinterleave4`` on the
    serving path: the GEMM-output transpose measured ~0.6 ms in-context
    (XLA won't fuse it into the GEMM epilogue), the input one ~0.02.
    Exact (same reduction set, zero-padded extra slots).

    hi_lo: f32-accurate conv on bf16 MXU passes (serve_quality v1). The
    f32 input and kernel each split into bf16 hi + lo halves and the GEMM
    contracts [im_hi | im_lo | im_hi] against [k_hi; k_hi; k_lo] — three
    of the four cross terms (lo*lo ~ 2^-18 relative, dropped). Measured
    9.65 ms at 720p (vs 0.84 base) — the f32 im2col materialization, not
    the GEMM, is the cost. Kept for probing; serving uses k_hi_lo.

    k_hi_lo + pre_scale (serve_quality v2): exact-uint8 conv1. The caller
    feeds bf16(x*255) — integers <=255 are EXACTLY representable in bf16
    (8 significand bits) — and pre_scale=1/255 folds the de-normalization
    into the f32 kernel BEFORE its bf16 hi/lo split, so only the KERNEL
    needs splitting: the GEMM contracts [im | im] against [k_hi; k_lo]
    (K 54 -> 108, still one MXU depth-tile pair) with f32 accumulation.
    Same input-quantization + weight-rounding kill as hi_lo but the
    im2col stays bf16 — no 9x f32 HBM traffic.

    ``pre_scale`` multiplies the kernel (NOT the bias) by a scalar in f32
    at trace time; usable with any mode. ``out_dtype`` picks the output
    dtype (default bfloat16 under hi_lo/k_hi_lo, else xp.dtype).
    """
    b, h, wp2, c2i = xp.shape
    g = wp2 // 4
    kh, kw, cin, cout = kernel.shape
    pad_h = (kh - 1) // 2
    pad = (kw - 1) // 2
    jmin = (0 - pad) // 2
    f32acc = hi_lo or k_hi_lo
    if f32acc:
        dt = out_dtype or jnp.bfloat16
        kp32 = pack_kernel_width2(kernel.astype(jnp.float32))
        if pre_scale is not None:
            kp32 = kp32 * jnp.float32(pre_scale)
        khp, kwp, _, c2o = kp32.shape
        km32 = kp32.reshape(khp * kwp * c2i, c2o)
        km_hi = km32.astype(jnp.bfloat16)
        km_lo = (km32 - km_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        if hi_lo:
            km = jnp.concatenate([km_hi, km_hi, km_lo], axis=0)
        else:
            # Stack hi/lo along N, not K: doubling K forces a second
            # im2col materialization (concat([im, im]) measured 5.03 ms
            # vs 0.59 base at 720p — XLA rematerializes the gather for
            # both halves); one GEMM against [k_hi | k_lo] reads im once
            # and the halves-add fuses into the epilogue.
            km = jnp.concatenate([km_hi, km_lo], axis=1)
    else:
        dt = out_dtype or xp.dtype
        k32 = kernel.astype(jnp.float32)
        if pre_scale is not None:
            k32 = k32 * jnp.float32(pre_scale)
        kp = pack_kernel_width2(k32).astype(xp.dtype)
        khp, kwp, _, c2o = kp.shape
        km = kp.reshape(khp * kwp * c2i, c2o)
    # Pad a whole group (4 packed cols) per side so every width tap is a
    # clean +-1 group shift in deint coordinates.
    xpad = jnp.pad(xp, ((0, 0), (pad_h, pad_h), (4, 4), (0, 0)))
    xd = (xpad.reshape(b, h + 2 * pad_h, g + 2, 4, c2i)
          .transpose(0, 1, 3, 2, 4))  # (B, H+2p, 4, G+2, 2Cin)
    if hi_lo:
        xd32 = xd.astype(jnp.float32)
        xd_hi = xd32.astype(jnp.bfloat16)
        xd_lo = (xd32 - xd_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # Build the im2col for ALL four output planes, stacked along a j axis,
    # and contract with ONE GEMM emitting (B, H, 4, G, 2Cout) directly.
    # The first version ran 4 separate per-j (M/4, K) GEMMs and stacked
    # their OUTPUTS — measured 0.745 ms vs 0.446 for the default-layout
    # single-GEMM dots at 720p (tools/conv1_bench.py): the per-j strided
    # gathers + 4x GEMM dispatch were the whole deint premium. Stacking
    # the ims BEFORE the GEMM keeps one fused gather-write and one
    # full-M GEMM; per-output reduction order is unchanged (exact).
    ims = []
    for j in range(4):
        cols = []
        for dy in range(khp):
            for jc in range(kwp):
                t = j + jc + jmin
                js = t % 4
                gs = 1 + (-1 if t < 0 else (1 if t > 3 else 0))
                cols.append((dy, js, gs))
        if hi_lo:
            im_hi = jnp.concatenate(
                [xd_hi[:, dy:dy + h, js, gs:gs + g, :]
                 for dy, js, gs in cols], axis=-1)
            im_lo = jnp.concatenate(
                [xd_lo[:, dy:dy + h, js, gs:gs + g, :]
                 for dy, js, gs in cols], axis=-1)
            ims.append(jnp.concatenate([im_hi, im_lo, im_hi], axis=-1))
        else:
            ims.append(jnp.concatenate(
                [xd[:, dy:dy + h, js, gs:gs + g, :]
                 for dy, js, gs in cols], axis=-1))
    im = jnp.stack(ims, axis=2)  # (B, H, 4, G, K)
    y = jnp.einsum("bhjgk,ko->bhjgo", im, km,
                   preferred_element_type=jnp.float32)
    if k_hi_lo:
        # Kernel-only split: one bf16 im contracts against
        # [k_hi | k_lo] stacked along N; the halves add in f32.
        # bf16*bf16 products are EXACT in the f32 accumulator
        # (8+8 significand bits < 24), so with an exact-integer im
        # the only error left is the kernel's dropped lo-of-lo
        # (~2^-17 relative).
        y = y[..., :c2o] + y[..., c2o:]
    if f32acc:
        if bias is not None:
            y = y + jnp.tile(bias.astype(jnp.float32), 2)
        if relu:
            y = jax.nn.relu(y)
        return y.astype(dt)
    # Bit-exact ordering of the per-j original: round the accumulator to
    # dt FIRST, then add the dt bias and relu in dt arithmetic.
    out = y.astype(dt)
    if bias is not None:
        out = out + jnp.tile(bias.astype(dt), 2)
    if relu:
        out = jax.nn.relu(out)
    return out


def conv2d_packed_raw(xp: jnp.ndarray, kernel: jnp.ndarray,
                      bias: jnp.ndarray | None = None,
                      relu: bool = False) -> jnp.ndarray:
    """Same-pad odd conv on an ALREADY width-2-packed input.

    xp: (B, H, W/2, 2Cin); kernel: raw HWIO (kh, kw, Cin, Cout).
    Returns packed output (B, H, W/2, 2Cout). Exact (zero-filled extra
    kernel slots). Height uses normal zero padding; width halo rides
    packed-col zero padding.
    """
    kh, kw, cin, cout = kernel.shape
    pad_h = (kh - 1) // 2
    pad = (kw - 1) // 2
    jmin = (0 - pad) // 2
    jmax = (1 + pad) // 2
    kp = pack_kernel_width2(kernel).astype(xp.dtype)
    dn = lax.conv_dimension_numbers(xp.shape, kp.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        xp, kp, (1, 1), ((pad_h, pad_h), (-jmin, jmax)),
        dimension_numbers=dn,
    ).astype(xp.dtype)
    if bias is not None:
        out = out + jnp.tile(bias.astype(xp.dtype), 2)
    if relu:
        out = jax.nn.relu(out)
    return out


def conv2d_packed2(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray | None = None,
                   relu: bool = False) -> jnp.ndarray:
    """Exact 3x3 same-pad conv computed on a width-2 pixel-packed layout.

    For C=64 convs the NHWC minor dim half-fills the 128 MXU lanes AND the
    128-byte HBM tile, so XLA runs them at ~30 TF/s (measured 2.49 ms for the
    68 GF 64->64 conv at 720p). Packing two adjacent pixels into the channel
    dim — a FREE reshape in row-major NHWC — makes it a (3, 3, 2C, 2C) conv
    on (H, W/2, 2C): 2x the MACs but all 128 lanes busy (measured 1.84 ms).

    Exact: every extra kernel slot is zero.
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[3]
    xp = x.reshape(b, h, w // 2, 2 * cin)
    out = conv2d_packed_raw(xp, kernel, bias=bias, relu=relu)
    return out.reshape(b, h, w, cout)


def conv2d_packed_int8(xq: jnp.ndarray, kernel: jnp.ndarray,
                       x_scale, bias: jnp.ndarray | None = None,
                       relu: bool = False,
                       out_dtype=jnp.bfloat16,
                       pre_q=None) -> jnp.ndarray:
    """conv2d_packed_raw with int8 MXU compute.

    xq: (B, H, W/2, 2Cin) int8 (pre-quantized with ``x_scale``); kernel: raw
    float HWIO — per-output-channel int8 weight quant happens at trace time.
    Measured v5e: 0.95 ms vs 1.92 bf16 for the 3x3 64->64 @720p
    (tools/int8_conv_bench.py). Returns packed output in ``out_dtype``.

    ``pre_q``: optional (int8 HWIO kernel, (Co,) scales, bias-or-None) from
    offline GPTQ (ops/gptq.py) — the activation scale is ALREADY folded into
    it, so the fold and trace-time quantization are skipped.
    """
    from transformerupscaler_tpu.ops.quant import quantize_conv_kernel

    kh, kw, cin, cout = kernel.shape
    pad_h = (kh - 1) // 2
    pad = (kw - 1) // 2
    jmin = (0 - pad) // 2
    jmax = (1 + pad) // 2
    if pre_q is not None:
        kq = jnp.asarray(pre_q[0])
        ks = jnp.asarray(pre_q[1], jnp.float32)
        if pre_q[2] is not None:
            bias = jnp.asarray(pre_q[2], jnp.float32)
    else:
        # Fold the (scalar or per-input-channel) activation scale into the
        # kernel before weight quantization — exact, so per-channel
        # activation quant costs nothing at run time (quantize_act_ch).
        keff = (kernel.astype(jnp.float32)
                * jnp.asarray(x_scale, jnp.float32).reshape(1, 1, -1, 1))
        kq, ks = quantize_conv_kernel(keff)
    kp = pack_kernel_width2(kq)
    dn = lax.conv_dimension_numbers(xq.shape, kp.shape, ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        xq, kp, (1, 1), ((pad_h, pad_h), (-jmin, jmax)),
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * jnp.tile(ks, 2)
    if bias is not None:
        y = y + jnp.tile(bias.astype(jnp.float32), 2)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)


def conv2d_int8(xq: jnp.ndarray, kernel: jnp.ndarray, x_scale,
                bias: jnp.ndarray | None = None, padding: int = 0,
                relu: bool = False,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Direct NHWC int8 conv (int8 x int8 -> int32 MXU).

    xq: (B, H, W, Cin) int8 pre-quantized per input channel with
    ``x_scale`` (Cin,); kernel: raw float HWIO. The activation scale folds
    into the kernel before per-output-channel weight quantization (same
    recipe as conv2d_packed_int8). Used for the large-channel composed
    tails (Co >= 64, e.g. scale 6's 64->108) where the packed forms add
    MAC inflation for no lane gain and int8's doubled MXU rate is the only
    remaining lever — the tails are ~1.2 TF real work per 720p frame at
    scale 6 (PERFORMANCE.md).
    """
    from transformerupscaler_tpu.ops.quant import quantize_conv_kernel

    keff = (kernel.astype(jnp.float32)
            * jnp.asarray(x_scale, jnp.float32).reshape(1, 1, -1, 1))
    kq, ks = quantize_conv_kernel(keff)
    dn = lax.conv_dimension_numbers(xq.shape, kq.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        xq, kq, (1, 1), ((padding, padding), (padding, padding)),
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * ks
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)


def conv2d_tail_packed_int8(xq: jnp.ndarray, kernel: jnp.ndarray,
                            x_scale, bias: jnp.ndarray | None = None,
                            relu: bool = False,
                            out_dtype=jnp.bfloat16,
                            block: int = 8, pre_q=None) -> jnp.ndarray:
    """conv2d_tail_packed with int8 MXU compute (measured v5e: 0.38/0.29 ms
    vs 1.83/2.07 bf16 for the composed 5x5/7x7 tails @720p).

    xq: int8 packed input quantized with ``x_scale``; kernel raw float
    (kh, kw, Cin, co). Returns (B, H, W/block, block*co) in ``out_dtype``.
    ``pre_q``: offline-GPTQ (kernel, scales, bias) as in conv2d_packed_int8.
    """
    from transformerupscaler_tpu.ops.quant import quantize_conv_kernel

    kh, kw, cin, co = kernel.shape
    pad_h = (kh - 1) // 2
    pad = (kw - 1) // 2
    boff = (pad + 1) // 2
    jmax = (block - 1 + pad) // 2
    kwp = jmax + boff + 1
    if pre_q is not None:
        kq = jnp.asarray(pre_q[0])
        ks = jnp.asarray(pre_q[1], jnp.float32)
        if pre_q[2] is not None:
            bias = jnp.asarray(pre_q[2], jnp.float32)
    else:
        keff = (kernel.astype(jnp.float32)
                * jnp.asarray(x_scale, jnp.float32).reshape(1, 1, -1, 1))
        kq, ks = quantize_conv_kernel(keff)
    kp = pack_tail_stride4(kq, block)
    pad_r = kwp - boff - block // 2
    dn = lax.conv_dimension_numbers(xq.shape, kp.shape, ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        xq, kp, (1, block // 2), ((pad_h, pad_h), (boff, max(pad_r, 0))),
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * jnp.tile(ks, block)
    if bias is not None:
        y = y + jnp.tile(bias.astype(jnp.float32), block)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)


def pack_tail_stride4(kernel: jnp.ndarray, block: int = 8) -> jnp.ndarray:
    """Composed-tail kernel (kh, kw, Cin, co) -> stride-(block/2)
    packed-layout kernel (kh, kwp, 2Cin, block*co) producing macro-``block``
    outputs (``block`` even).

    Output block b covers pixels block*b..block*b+block-1; out lane s*co + o
    is sub-pixel s. Input pixel block*b+s+dx (dx in [-pad, pad]) lives at
    packed col (block/2)*b + floor((s+dx)/2), parity (s+dx) % 2. The conv
    runs with stride (1, block/2) over packed cols with boff cols of left
    zero padding. MAC inflation vs the true conv is 2*kwp/kw — smaller
    blocks inflate less, so callers pick the smallest even block whose
    block*co fills the 128 MXU lanes (see tail_block).
    """
    kh, kw, cin, co = kernel.shape
    pad = (kw - 1) // 2
    boff = (pad + 1) // 2  # = -floor((0-pad)/2)
    jmax = (block - 1 + pad) // 2
    kwp = jmax + boff + 1
    kp = jnp.zeros((kh, kwp, 2 * cin, block * co), kernel.dtype)
    for s in range(block):
        for dx in range(-pad, pad + 1):
            t = s + dx
            j = (t - (t % 2)) // 2 + boff
            pxi = t % 2
            kp = kp.at[:, j, pxi * cin:(pxi + 1) * cin,
                       s * co:(s + 1) * co].add(kernel[:, dx + pad])
    return kp


def tail_block(co: int, w: int) -> int:
    """Smallest even macro-block whose block*co fills the 128 MXU lanes
    (>= 96) and divides the image width — smaller blocks mean less MAC
    inflation (2*kwp/kw), so e.g. co=12 -> 8, co=27 -> 4, co>=48 -> 2."""
    for b in (2, 4, 6, 8):
        if b * co >= 96 and w % b == 0:
            return b
    return 8 if w % 8 == 0 else 2


def conv2d_tail_packed(xp: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray | None = None,
                       relu: bool = False, block: int = 8) -> jnp.ndarray:
    """Small-output composed tail on the packed layout: one stride-(1,
    block/2) conv producing macro-``block`` outputs (all block*co lanes
    busy, 128-lane input streams at full HBM rate).

    xp: (B, H, W/2, 2Cin) packed features; kernel: raw (kh, kw, Cin, co).
    Returns (B, H, W/block, block*co); reshape to (B, H, W, co) is free.
    """
    kh, kw, cin, co = kernel.shape
    pad_h = (kh - 1) // 2
    pad = (kw - 1) // 2
    boff = (pad + 1) // 2
    jmax = (block - 1 + pad) // 2
    kwp = jmax + boff + 1
    kp = pack_tail_stride4(kernel, block).astype(xp.dtype)
    # Right padding: last block b=WB-1 reads packed cols (block/2)*b-boff ..
    # +kwp-1; (block/2)(WB-1)+kwp-boff-1 <= WP2-1+pad_r.
    pad_r = kwp - boff - block // 2
    dn = lax.conv_dimension_numbers(xp.shape, kp.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        xp, kp, (1, block // 2), ((pad_h, pad_h), (boff, max(pad_r, 0))),
        dimension_numbers=dn,
    ).astype(xp.dtype)
    if bias is not None:
        out = out + jnp.tile(bias.astype(xp.dtype), block)
    if relu:
        out = jax.nn.relu(out)
    return out


def pack_tail_valid(kernel: jnp.ndarray, block: int) -> jnp.ndarray:
    """Like pack_tail_stride4 but for VALID windows over a pre-padded input:
    output pixel block*b+s reads input pixels block*b+s+dx, dx in [0, kw) —
    no negative offsets, so kernels of EVEN effective support (e.g. the
    4-tap bicubic phases embedded in a 5-tap frame) work too."""
    kh, kw, cin, co = kernel.shape
    jmax = (block - 1 + kw - 1) // 2
    kwp = jmax + 1
    kp = jnp.zeros((kh, kwp, 2 * cin, block * co), kernel.dtype)
    for s in range(block):
        for dx in range(kw):
            t = s + dx
            j = t // 2
            pxi = t % 2
            kp = kp.at[:, j, pxi * cin:(pxi + 1) * cin,
                       s * co:(s + 1) * co].add(kernel[:, dx])
    return kp


def conv2d_tail_packed_valid(xp: jnp.ndarray, kernel: jnp.ndarray,
                             bias: jnp.ndarray | None = None,
                             relu: bool = False,
                             block: int = 8) -> jnp.ndarray:
    """VALID-window macro-``block`` conv on a width-2-packed PRE-PADDED
    input: xp is (B, H + kh - 1, (W + kw - 1)/2, 2Cin) (the caller pads the
    pixel domain, e.g. edge-replicate for resize border semantics);
    returns (B, H, W/block, block*co)."""
    kh, kw, cin, co = kernel.shape
    jmax = (block - 1 + kw - 1) // 2
    kwp = jmax + 1
    kp = pack_tail_valid(kernel, block).astype(xp.dtype)
    dn = lax.conv_dimension_numbers(xp.shape, kp.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        xp, kp, (1, block // 2), ((0, 0), (0, 0)),
        dimension_numbers=dn,
    ).astype(xp.dtype)
    if bias is not None:
        out = out + jnp.tile(bias.astype(xp.dtype), block)
    if relu:
        out = jax.nn.relu(out)
    return out


def conv2d_packed_stride2(xp: jnp.ndarray, kernel: jnp.ndarray,
                          bias: jnp.ndarray | None = None,
                          relu: bool = False) -> jnp.ndarray:
    """Stride-2 same-pad 3x3 conv on a width-2-packed input, emitting the
    packed layout at half resolution (the reference's downsample conv,
    ResidualTransformer/model.py:88, without ever unpacking).

    xp: (B, H, W/2, 2Cin) -> (B, H/2, W/4, 2Cout). Output pixel w_o (parity
    pxo, packed col c_o = w_o // 2) reads input pixel 2*w_o + dx, i.e.
    packed col 2*c_o + floor((2*pxo + dx)/2), parity (2*pxo + dx) % 2 — a
    stride-(2, 2) conv over packed cols with 1 col of left zero padding.
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3)
    kp = jnp.zeros((3, 3, 2 * cin, 2 * cout), kernel.dtype)
    for pxo in range(2):
        for dx in (-1, 0, 1):
            t = 2 * pxo + dx
            j = (t - (t % 2)) // 2 + 1
            pxi = t % 2
            kp = kp.at[:, j, pxi * cin:(pxi + 1) * cin,
                       pxo * cout:(pxo + 1) * cout].add(kernel[:, dx + 1])
    kp = kp.astype(xp.dtype)
    dn = lax.conv_dimension_numbers(xp.shape, kp.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        xp, kp, (2, 2), ((1, 1), (1, 0)),
        dimension_numbers=dn,
    ).astype(xp.dtype)
    if bias is not None:
        out = out + jnp.tile(bias.astype(xp.dtype), 2)
    if relu:
        out = jax.nn.relu(out)
    return out


def conv2d_macro(x: jnp.ndarray, kernel: jnp.ndarray,
                 bias: jnp.ndarray | None = None, padding: int = 1,
                 relu: bool = False, block: int = 8) -> jnp.ndarray:
    """Exact same-output conv for SMALL output-channel kernels, reshaped so
    the MXU's 128 lanes stay busy.

    XLA pads conv output channels to 128 lanes, so a (kh, kw, Cin, O) conv
    with O in {3, 12} wastes >90% of the MXU (measured: the 5x5 64->12
    composed tail costs 4.6 ms of a 28.7 ms 720p frame on v5e). This computes
    ``block`` horizontally-adjacent output pixels as one stride-``block``
    conv with block*O output channels: kernel (kh, kw+block-1, Cin, block*O)
    where slot (s, c) holds k[:, X-s, :, c]. MAC inflation is
    (kw+block-1)/kw, a large win whenever block*O fills lanes better than O.
    Pick block so block*O is near (a multiple of) 128 and divides W.

    Bit-exact vs conv2d (same taps, same adds, zero-filled extras).
    """
    kh, kw, cin, o = kernel.shape
    b, h, w, _ = x.shape
    if w % block:
        raise ValueError(f"width {w} not divisible by block {block}")
    kw_m = kw + block - 1
    km = jnp.zeros((kh, kw_m, cin, block, o), kernel.dtype)
    for s in range(block):
        km = km.at[:, s:s + kw, :, s, :].add(kernel)
    km = km.reshape(kh, kw_m, cin, block * o)
    pad_r = kw - 1 - padding
    dn = lax.conv_dimension_numbers(x.shape, km.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x, km.astype(x.dtype), (1, block),
        ((padding, padding), (padding, pad_r)),
        dimension_numbers=dn,
    ).astype(x.dtype)
    out = out.reshape(b, h, w, o)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    if relu:
        out = jax.nn.relu(out)
    return out


def compose_conv3x3_kernels(k1: jnp.ndarray, b1: jnp.ndarray | None,
                            k2: jnp.ndarray, b2: jnp.ndarray | None):
    """Compose two 3x3/any-size correlation kernels into one.

    ``conv(conv(x, k1, pad) , k2, pad)`` == ``conv(x, k_comp, pad+pad)``
    everywhere EXCEPT a 1-pixel border ring (the sequential form zero-pads
    the *intermediate*, the composed form zero-pads the *input*). Used for
    the flag-gated fast inference path; the exact path keeps both convs.

    k1: (a, a, C, M); k2: (b, b, M, O) -> (a+b-1, a+b-1, C, O).
    Returns (k_comp, b_comp) with b_comp folding k2 applied to the constant
    b1 plus b2.
    """
    a = k1.shape[0]
    b = k2.shape[0]
    n = a + b - 1
    c, o = k1.shape[2], k2.shape[3]
    kc = jnp.zeros((n, n, c, o), k1.dtype)
    for p in range(a):
        for q in range(a):
            for s in range(b):
                for t in range(b):
                    kc = kc.at[p + s, q + t].add(
                        jnp.einsum("cm,mo->co", k1[p, q], k2[s, t]))
    bc = None
    if b1 is not None or b2 is not None:
        bc = jnp.zeros((o,), k1.dtype)
        if b1 is not None:
            bc = bc + jnp.einsum("stmo,m->o", k2, b1.astype(k2.dtype))
        if b2 is not None:
            bc = bc + b2.astype(k1.dtype)
    return kc, bc
