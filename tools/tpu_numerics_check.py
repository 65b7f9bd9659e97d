#!/usr/bin/env python
"""Real-TPU numerics parity for the serve_quality ops.

The interpret-mode unit tests (tests/test_pallas_stream.py) prove the
serve_quality kernels' MATH; this checks the Mosaic-compiled TPU
binaries — the CPU bisect of the +0.35 dB quality GT regression came
back clean (tools/headline_quality.py --attribute quality_parts on CPU
improves fidelity), so the defect must be TPU-execution-specific.

Checks (each vs an f32 reference computed with HIGHEST-precision XLA on
the same device, printed as max-abs + PSNR-style dB):
  conv1   conv2d_packed_dots_deint k_hi_lo+pre_scale on uint8-grid input
  tailf32 tail_macro8_stream out_dtype=f32 (5x5 and 7x7)
  squash  resize_shuffled f32 @ Precision.HIGH

Usage: python tools/tpu_numerics_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def err(name, got, want):
    g = np.asarray(got, np.float64)
    w = np.asarray(want, np.float64)
    g = g.reshape(w.shape)
    m = float(np.abs(g - w).max())
    rms = float(np.sqrt(np.mean((g - w) ** 2)))
    scale = float(np.sqrt(np.mean(w ** 2))) or 1.0
    db = 20 * np.log10(scale / rms) if rms else np.inf
    print(f"{name:44s} max {m:.3e}  rel-rms {rms / scale:.3e} "
          f"({db:6.1f} dB)", flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    from transformerupscaler_tpu.ops.conv import conv2d_packed_dots_deint
    from transformerupscaler_tpu.ops.pallas.stream import (
        deinterleave4,
        interleave4,
        tail_macro8_stream,
    )
    from transformerupscaler_tpu.ops.resize import resize_shuffled

    B, H, W = 1, 144, 256
    u8 = rng.integers(0, 256, (B, H, W, 3)).astype(np.float32)
    x = u8 / 255.0
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, 64)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)

    @jax.jit
    def ref_conv(xv):
        from jax import lax

        dn = lax.conv_dimension_numbers(xv.shape, k1.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(xv, k1, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=dn,
                                     precision=jax.lax.Precision.HIGHEST)
        return jax.nn.relu(y + b1)

    want = ref_conv(jnp.asarray(x))

    @jax.jit
    def got_conv(xq):
        yd = conv2d_packed_dots_deint(xq, k1, b1, relu=True, k_hi_lo=True,
                                      pre_scale=1.0 / 255.0,
                                      out_dtype=jnp.float32)
        return interleave4(yd)

    xq = jnp.asarray((x * 255.0).reshape(B, H, W // 2, 6)).astype(jnp.bfloat16)
    err("conv1 k_hi_lo (uint8 grid) vs f32 conv", got_conv(xq), want)

    # bf16-input baseline for scale: one input rounding + bf16 GEMM.
    @jax.jit
    def base_conv(xp):
        yd = conv2d_packed_dots_deint(xp, k1.astype(jnp.bfloat16), b1,
                                      relu=True, out_dtype=jnp.float32)
        return interleave4(yd)

    xp = jnp.asarray(x.reshape(B, H, W // 2, 6)).astype(jnp.bfloat16)
    err("conv1 plain bf16 (for scale)", base_conv(xp), want)

    C = 64
    xf = jnp.asarray(rng.standard_normal((B, H, W // 2, 2 * C)), jnp.float32)
    for kh in (5, 7):
        kt = jnp.asarray(rng.standard_normal((kh, kh, C, 12)) * 0.05,
                         jnp.float32)
        bt = jnp.asarray(rng.standard_normal(12) * 0.05, jnp.float32)

        @jax.jit
        def ref_tail(xv, kt=kt, bt=bt, kh=kh):
            from jax import lax

            xn = xv.reshape(B, H, W, C)
            dn = lax.conv_dimension_numbers(xn.shape, kt.shape,
                                            ("NHWC", "HWIO", "NHWC"))
            p = (kh - 1) // 2
            return lax.conv_general_dilated(
                xn, kt, (1, 1), ((p, p), (p, p)), dimension_numbers=dn,
                precision=jax.lax.Precision.HIGHEST) + bt

        @jax.jit
        def got_tail(xv, kt=kt, bt=bt):
            return tail_macro8_stream(deinterleave4(xv.astype(jnp.bfloat16)),
                                      kt.astype(jnp.bfloat16), bt,
                                      out_dtype=jnp.float32)

        @jax.jit
        def got_tail_bf16(xv, kt=kt, bt=bt):
            return tail_macro8_stream(deinterleave4(xv.astype(jnp.bfloat16)),
                                      kt.astype(jnp.bfloat16), bt)

        want = ref_tail(xf)
        err(f"tail {kh}x{kh} f32-out vs f32 conv", got_tail(xf), want)
        err(f"tail {kh}x{kh} bf16-out (for scale)",
            np.asarray(got_tail_bf16(xf), np.float32), want)

    # tail_finish_stream (split-B tail), the shipping configs: bf16 out
    # (fast) and f32 out (quality), both with hi_lo_fin (f32 mid AND f32
    # finish weights split losslessly in-kernel).
    from transformerupscaler_tpu.ops.pallas.stream import tail_finish_stream

    km = jnp.asarray(rng.standard_normal((5, 5, C, 12)) * 0.05, jnp.float32)
    bm5 = jnp.asarray(rng.standard_normal(12) * 0.05, jnp.float32)
    kf5 = jnp.asarray(rng.standard_normal((3, 3, 12, 12)) * 0.1, jnp.float32)
    bf5 = jnp.asarray(rng.standard_normal(12) * 0.05, jnp.float32)

    @jax.jit
    def ref_fin(xv):
        from jax import lax

        xn = xv.reshape(B, H, W, C)
        dn = lax.conv_dimension_numbers(xn.shape, km.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        mid = lax.conv_general_dilated(
            xn, km, (1, 1), ((2, 2), (2, 2)), dimension_numbers=dn,
            precision=jax.lax.Precision.HIGHEST) + bm5
        dn2 = lax.conv_dimension_numbers(mid.shape, kf5.shape,
                                         ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            mid, kf5, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn2,
            precision=jax.lax.Precision.HIGHEST) + bf5

    from functools import partial

    @partial(jax.jit, static_argnames=("odt",))
    def got_fin(xv, odt=jnp.float32):
        return tail_finish_stream(deinterleave4(xv.astype(jnp.bfloat16)),
                                  km, bm5, kf5, bf5, out_dtype=odt)

    want = ref_fin(xf)
    err("tail_finish f32-out hi_lo vs f32 two-conv", got_fin(xf), want)
    err("tail_finish bf16-out hi_lo (for scale)",
        np.asarray(got_fin(xf, odt=jnp.bfloat16), np.float32), want)

    z = jnp.asarray(rng.standard_normal((B, H, W // 2, 12)), jnp.float32)

    @jax.jit
    def ref_sq(zv):
        return resize_shuffled(zv, 2, (int(H * 1.5), int(W * 0.75)),
                               precision=jax.lax.Precision.HIGHEST)

    for prec, name in ((jax.lax.Precision.HIGH, "HIGH"),
                       (None, "default")):
        @jax.jit
        def got_sq(zv, prec=prec):
            return resize_shuffled(zv, 2, (int(H * 1.5), int(W * 0.75)),
                                   precision=prec)

        err(f"squash f32 {name} vs HIGHEST", got_sq(z), ref_sq(z))


if __name__ == "__main__":
    main()
