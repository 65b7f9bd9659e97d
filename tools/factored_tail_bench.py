#!/usr/bin/env python
"""Branch-B tail routing A/B: composed-with-pre vs factored (per scale).

The serving path folds decoder_conv2 (3x3 64->3) into the branch-B
composed tail (composed_tail_kernel pre_kernel), giving a 7x7 64->co conv.
That fold pays MACs through a rank-3 bottleneck expansion: the same map
factors as (3x3 64->3) o (5x5 3->co), whose real MAC count is 9-45x
smaller (e.g. scale 6: 624 GF folded vs ~55 GF factored incl. macro-block
inflation). The fold was the right call in round 1 when the alternative
was a 128-lane-padded direct 64->3 conv; this probes whether it still
wins against the macro-packed small conv (conv2d_tail_packed, block<=32).

Probes both routings per scale from the layout each would really start
from (deint for the Pallas 2/3/4 tails incl. the interleave4 crossing;
packed/NHWC for scale 6's direct conv).

Usage: python tools/factored_tail_bench.py [scales] [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    scales = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                               else ["2", "3", "4", "6"])]
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from transformerupscaler_tpu.ops.conv import (
        compose_conv3x3_kernels,
        conv2d,
        conv2d_tail_packed,
        tail_block,
    )
    from transformerupscaler_tpu.ops.pallas.stream import (
        deinterleave4,
        interleave4,
        tail_macro8_stream,
    )

    dev = jax.devices()[0]
    print(f"device: {dev}")
    rng = np.random.default_rng(0)
    B, H, W, C = 1, 720, 1280, 64
    dt = jnp.bfloat16
    xp = jnp.asarray(rng.standard_normal((B, H, W // 2, 2 * C)), dt)
    xd = deinterleave4(xp)
    k_dec2 = jnp.asarray(rng.standard_normal((3, 3, 64, 3)) * 0.1, dt)
    b_dec2 = jnp.asarray(rng.standard_normal(3) * 0.1, dt)

    for scale in scales:
        co = 3 * scale * scale
        k5 = jnp.asarray(rng.standard_normal((5, 5, 3, co)) * 0.1, dt)
        b5 = jnp.asarray(rng.standard_normal(co) * 0.1, dt)
        kc, bc = compose_conv3x3_kernels(k_dec2, b_dec2, k5, b5)

        if scale == 6:
            # Current: direct XLA conv on NHWC (the direct_tails branch).
            def cur(p, x):
                xn = x.reshape(B, H, W, C)
                return conv2d(xn, p["kc"], p["bc"],
                              padding=(p["kc"].shape[0] - 1) // 2,
                              auto_macro=False)

            def fac(p, x):
                r = conv2d_tail_packed(x, p["kd"], p["bd"], block=32)
                rp = r.reshape(B, H, W // 2, 6)
                return conv2d(rp.reshape(B, H, W, 3), p["k5"], p["b5"],
                              padding=2, auto_macro=False)

            params = {"kc": kc, "bc": bc, "kd": k_dec2, "bd": b_dec2,
                      "k5": k5, "b5": b5}
            probe(f"x{scale} cur: direct 7x7 64->{co}", cur, params, xp, K=K)
            probe(f"x{scale} fac: dec2 blk32 + direct 5x5 3->{co}",
                  fac, params, xp, K=K)
            # Factored with the tail also macro-packed (co=108 fills lanes
            # already, but the packed form reads 128-lane inputs).
            def fac2(p, x):
                r = conv2d_tail_packed(x, p["kd"], p["bd"], block=32)
                rp = r.reshape(B, H, W // 2, 6)
                return conv2d_tail_packed(rp, p["k5"], p["b5"], block=2)

            probe(f"x{scale} fac2: dec2 blk32 + packed blk2 5x5",
                  fac2, params, xp, K=K)
        else:
            blk = tail_block(co, W)

            def cur(p, x):
                return tail_macro8_stream(x, p["kc"], p["bc"])

            def fac(p, x):
                xi = interleave4(x)
                r = conv2d_tail_packed(xi, p["kd"], p["bd"], block=32)
                rp = r.reshape(B, H, W // 2, 6)
                return conv2d_tail_packed(rp, p["k5"], p["b5"], block=blk)

            params = {"kc": kc, "bc": bc, "kd": k_dec2, "bd": b_dec2,
                      "k5": k5, "b5": b5}
            probe(f"x{scale} cur: pallas 7x7 64->{co}", cur, params, xd, K=K)
            probe(f"x{scale} fac: il4 + dec2 blk32 + 5x5 blk{blk}",
                  fac, params, xd, K=K)


if __name__ == "__main__":
    main()
