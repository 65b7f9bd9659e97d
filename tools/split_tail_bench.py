#!/usr/bin/env python
"""Split-B-tail probe: composed 7x7 vs [5x5 + tiny commuted-tail finish].

The serving path folds branch B's whole chain (dec2 pre-conv, Upsampler
stage(s), commuted RGB tail) into ONE 7x7 64->3r^2 conv. Composition
through the 3-channel RGB bottleneck is what inflates it: at x2 the
7x7 64->12 costs 37.6k MACs/px while [pre o stage] alone is a 5x5 64->12
(19.2k) and the commuted tail is a 3x3 12->12 (1.3k) — the composed form
nearly DOUBLES the B-tail work to save one tiny conv. At x4 it's ~6x
(7x7 64->48 = 150k vs 5x5 64->12 + 3x3 12->48 = 24k): the fold runs the
entire 16-phase tail against 64 input channels.

This probes, per scale {2,3,4}, the in-model forms:
  composed   tail_macro8_stream(xd, 7x7 64->3r^2)        [ships]
  split      tail_macro8_stream(xd, 5x5 64->12)          [pre o stage]
             + conv2d_tail_packed(3x3 12->3r^2, block=8) [commuted tail]
(x4's split stage is 64->12 — [pre o stage1] — and its finish commutes
stage2+tail through the first shuffle: 3x3 12->48.)

MFU printed per op; the split's finish runs as a block-8 macro XLA conv
(Pallas -> XLA is the clean crossing direction, PERFORMANCE.md crossing
rule, and its output feeds only XLA add/shuffle).

Usage: python tools/split_tail_bench.py [K] [scales]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.probe_lib import probe

PEAK_TFS = 197.0


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scales = [int(s) for s in (sys.argv[2] if len(sys.argv) > 2
                               else "2,3,4").split(",")]
    from transformerupscaler_tpu.ops.conv import conv2d_tail_packed
    from transformerupscaler_tpu.ops.pallas.stream import (
        deinterleave4,
        tail_macro8_stream,
    )

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    B, H, W, C = 1, 720, 1280, 64
    xp = jnp.asarray(rng.standard_normal((B, H, W // 2, 2 * C)), dt)
    xd = deinterleave4(xp)

    def report(per, gmac):
        print(f"      {gmac:6.1f} GMAC  {2 * gmac / per / 1e3:6.1f} TF/s  "
              f"{200 * gmac / per / 1e3 / PEAK_TFS:5.1f}% MFU", flush=True)

    for s in scales:
        co = 3 * s * s
        k7 = jnp.asarray(rng.standard_normal((7, 7, C, co)) * 0.05, dt)
        b7 = jnp.asarray(rng.standard_normal(co) * 0.05, dt)
        per = probe(f"x{s} B composed: macro8 7x7 64->{co}",
                    lambda p, v: tail_macro8_stream(v, p["k"], p["b"]),
                    {"k": k7, "b": b7}, xd, K, log=print)
        report(per, H * W * 49 * C * co / 1e9)

        # Split: [pre o stage] 5x5 64->cm, then the commuted tail
        # 3x3 cm->co (cm = 12 at x2/x4 — x4 splits after stage 1 — and
        # 27 at x3; models/upsampler.split_tail_kernels).
        cm = 12 if s in (2, 4) else 3 * s * s
        k5 = jnp.asarray(rng.standard_normal((5, 5, C, cm)) * 0.05, dt)
        b5 = jnp.asarray(rng.standard_normal(cm) * 0.05, dt)
        kt = jnp.asarray(rng.standard_normal((3, 3, cm, co)) * 0.05, dt)
        bt = jnp.asarray(rng.standard_normal(co) * 0.05, dt)

        def split(p, v):
            mid = tail_macro8_stream(v, p["k5"], p["b5"])
            midp = mid.reshape(B, H, W // 2, 2 * cm)
            return conv2d_tail_packed(midp, p["kt"], p["bt"], block=8)

        per = probe(f"x{s} B split: 5x5 64->{cm} + 3x3 {cm}->{co}",
                    split, {"k5": k5, "b5": b5, "kt": kt, "bt": bt},
                    xd, K, log=print)
        report(per, H * W * (25 * C * cm + 9 * cm * co) / 1e9)

        # The finish alone (attribution).
        midp = jnp.asarray(rng.standard_normal((B, H, W // 2, 2 * cm)), dt)
        per = probe(f"x{s}   finish alone: 3x3 {cm}->{co} block-8",
                    lambda p, v: conv2d_tail_packed(v, p["kt"], p["bt"],
                                                    block=8),
                    {"kt": kt, "bt": bt}, midp, K, log=print)
        report(per, H * W * 9 * cm * co / 1e9)

        # Fused: mid + in-VMEM finish in one kernel (the shipping form).
        from transformerupscaler_tpu.ops.pallas.stream import (
            tail_finish_stream,
        )

        per = probe(f"x{s} B FUSED: 5x5 64->{cm} + finish in-kernel",
                    lambda p, v: tail_finish_stream(v, p["k5"], p["b5"],
                                                    p["kt"], p["bt"]),
                    {"k5": k5, "b5": b5, "kt": kt, "bt": bt}, xd, K,
                    log=print)
        report(per, H * W * (25 * C * cm + 9 * cm * co) / 1e9)


if __name__ == "__main__":
    main()
