#!/usr/bin/env python
"""Branch-A tail at scale 6 (7x7 64->108 composed conv + ReLU): routing A/B.

direct_tails routes co>=64 to a plain XLA conv (the lanes are already full),
measured ~5.4 ms at 720p — 59% MFU on the 311-GMAC composed kernel. This
probes whether the macro-8 Pallas stream kernel (output tile 8*co=864 lanes,
a non-multiple of 128 Mosaic must pad ~4%) or a macro-2 packed XLA form
does better from the layouts each would really start from.

Usage: python tools/a6_tail_bench.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from transformerupscaler_tpu.ops.conv import conv2d, conv2d_tail_packed
    from transformerupscaler_tpu.ops.pallas.stream import (
        deinterleave4,
        tail_macro8_stream,
    )

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    B, H, W, C = 1, 720, 1280, 64
    co = 108
    dt = jnp.bfloat16
    xp = jnp.asarray(rng.standard_normal((B, H, W // 2, 2 * C)), dt)
    xd = deinterleave4(xp)
    k = jnp.asarray(rng.standard_normal((7, 7, C, co)) * 0.05, dt)
    bias = jnp.asarray(rng.standard_normal(co) * 0.05, dt)
    params = {"k": k, "b": bias}

    def direct(p, x):
        xn = x.reshape(B, H, W, C)
        return conv2d(xn, p["k"], p["b"], padding=3, relu=True,
                      auto_macro=False)

    probe("x6 A direct: XLA 7x7 64->108 (from packed)", direct, params, xp,
          K=K)

    def pallas(p, x):
        return tail_macro8_stream(x, p["k"], p["b"], relu=True)

    probe("x6 A pallas: macro8 7x7 64->108 (from deint)", pallas, params, xd,
          K=K)

    def packed2(p, x):
        return conv2d_tail_packed(x, p["k"], p["b"], relu=True, block=2)

    probe("x6 A packed: macro2 XLA 7x7 64->216L (from packed)", packed2,
          params, xp, K=K)


if __name__ == "__main__":
    main()
