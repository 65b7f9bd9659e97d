#!/usr/bin/env python
"""Attribute FastTransformer x4's 12.0 ms (83.7 fps — the worst non-floor
matrix row, VERDICT r3 weak#5).

The serving pipeline is scale-independent except for the two composed
branch tails (A: 5x5 64->3r^2, B: fold_pre 7x7 64->3r^2) and the output
interleave/clip; x4 folds BOTH Upsampler stages to base resolution
(models/upsampler.composed_tail_kernel), so its tails are 48-channel:
  A 5x5 64->48: 70.8 GMAC   B 7x7 64->48: 138.8 GMAC  (x2: 17.7/34.7)
This probes the full model at x2/x3/x4 in ONE process (differences
attribute the scale-dependent stages), the x4/x3 tails in the exact
macro-8 stream form the pallas path runs, their XLA direct alternatives,
and the output stage — each with MFU printed, so the row either gets a
faster routing or the same measured-floor analysis x6 got
(PERFORMANCE.md x6 section).

Usage: python tools/x4_bench.py [K] [probes: model tails out]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.probe_lib import probe

PEAK_TFS = 197.0  # v5e bf16


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    which = set(sys.argv[2:]) or {"model", "tails", "out"}
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    if "model" in which:
        from transformerupscaler_tpu.registry import get_model

        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
        model = get_model("FastTransformer", dtype=dt, compose_tails=True,
                          packed_serve=True, pallas_serve=True,
                          attn_impl="fused2")
        params = get_model("FastTransformer", dtype=dt).init(
            key, x, res_out=(1440, 2560))
        for s in (2, 3, 4):
            per = probe(f"model x{s}",
                        lambda p, v, s=s: model.apply(p, v, upscale_factor=s),
                        params, x, K, log=print)
            print(f"    -> {1.0 / per:8.2f} fps", flush=True)

    if "tails" in which:
        from transformerupscaler_tpu.ops.conv import conv2d
        from transformerupscaler_tpu.ops.pallas.stream import (
            deinterleave4,
            tail_macro8_stream,
        )

        B, H, W, C = 1, 720, 1280, 64
        xp = jnp.asarray(rng.standard_normal((B, H, W // 2, 2 * C)), dt)
        xd = deinterleave4(xp)
        for s, kh_a, kh_b in ((3, 5, 7), (4, 5, 7)):
            co = 3 * s * s
            for tag, kh in (("A", kh_a), ("B", kh_b)):
                k = jnp.asarray(rng.standard_normal((kh, kh, C, co)) * 0.05,
                                dt)
                bias = jnp.asarray(rng.standard_normal(co) * 0.05, dt)
                gmac = H * W * kh * kh * C * co / 1e9
                per = probe(
                    f"x{s} {tag} macro8 {kh}x{kh} 64->{co}",
                    lambda p, v: tail_macro8_stream(v, p["k"], p["b"],
                                                    relu=tag == "A"),
                    {"k": k, "b": bias}, xd, K, log=print)
                print(f"      {gmac:6.1f} GMAC  "
                      f"{2 * gmac / per / 1e3:6.1f} TF/s  "
                      f"{200 * gmac / per / 1e3 / PEAK_TFS:5.1f}% MFU",
                      flush=True)
                per = probe(
                    f"x{s} {tag} XLA direct {kh}x{kh} 64->{co}",
                    lambda p, v: conv2d(
                        v.reshape(B, H, W, C), p["k"], p["b"],
                        padding=(kh - 1) // 2, relu=tag == "A",
                        auto_macro=False),
                    {"k": k, "b": bias}, xp, K, log=print)
                print(f"      {gmac:6.1f} GMAC  "
                      f"{2 * gmac / per / 1e3:6.1f} TF/s  "
                      f"{200 * gmac / per / 1e3 / PEAK_TFS:5.1f}% MFU",
                      flush=True)

    if "out" in which:
        # The scale-dependent output stage: interleave + add + clip +
        # pixel-shuffle reshape on the r^2-packed tails (HBM-bound).
        from transformerupscaler_tpu.ops.pixel_shuffle import pixel_shuffle

        for s in (2, 3, 4):
            co = 3 * s * s
            a = jnp.asarray(rng.standard_normal((1, 720, 1280, co)), dt)
            bb = jnp.asarray(rng.standard_normal((1, 720, 1280, co)), dt)
            mb = 2 * (2 * a.size + s * s * 3 * 720 * 1280) / 1e6
            per = probe(f"x{s} out: add+shuffle+clip ({co}ch)",
                        lambda p, v, s=s: jnp.clip(
                            pixel_shuffle(v + p["b"], s), 0.0, 1.0),
                        {"b": bb}, a, K, log=print)
            print(f"      ~{mb:6.0f} MB traffic  "
                  f"{mb / per / 1e3:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
