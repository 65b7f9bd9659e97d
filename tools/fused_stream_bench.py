#!/usr/bin/env python
"""Fused conv+tail stream kernels vs the unfused Pallas chain, standalone.

Usage: python tools/fused_stream_bench.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    from transformerupscaler_tpu.ops.pallas.stream import (
        conv3x3_packed_stream,
        conv3x3_tail_emit_stream,
        conv3x3_tail_stream,
        deinterleave4,
        interleave4,
        tail_macro8_stream,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    h, wp2 = 720, 640
    xd = deinterleave4(jax.random.uniform(key, (1, h, wp2, 128), dt))
    kc = jax.random.uniform(key, (3, 3, 64, 64), dt) * 0.05
    bc = jnp.zeros((64,), jnp.float32)
    kt7 = jax.random.uniform(key, (7, 7, 64, 12), dt) * 0.05
    kt5 = jax.random.uniform(key, (5, 5, 64, 12), dt) * 0.05
    bt = jnp.zeros((12,), jnp.float32)
    print(f"device: {jax.devices()[0]}", flush=True)

    def unfused(v):
        dec = conv3x3_packed_stream(interleave4(v), kc, bc, relu=True)
        return tail_macro8_stream(deinterleave4(dec), kt7, bt)

    probe("unfused: inter + conv + deint + tail7",
          lambda p, v: unfused(v), None, xd, K, log=print)
    for rows in (8, 16, 24, 48):
        probe(f"fused conv+tail7 rows={rows}",
              lambda p, v, rows=rows: conv3x3_tail_stream(
                  v, kc, bc, kt7, bt, rows=rows),
              None, xd, K, log=print)
    probe("fused emit conv+tail5 rows=24",
          lambda p, v: conv3x3_tail_emit_stream(v, kc, bc, kt5, bt,
                                                rows=24)[0],
          None, xd, K, log=print)


if __name__ == "__main__":
    main()
