#!/usr/bin/env python
"""Pin the conv2-vs-decoder asymmetry in the round-5 stage budget.

deint_stage_bench attributes 1.188 ms to conv2 and 0.699 ms to the
decoder conv — the SAME conv3x3_deint_stream kernel at the SAME
(1, 720, 4, 160, 128) bf16 shape. If the isolated op probes at the
decoder's number, conv2's overage is a prefix-attribution seam (the
truncated-prefix baseline optimizes conv1+sum differently), not kernel
cost — which caps the real remaining headroom accordingly.

Probes (one process):
  iso        conv3x3_deint_stream alone on a fresh deint input
  conv1+2    the real encoder chain (dots conv1 -> conv2)
  conv1 only the chain's baseline
  iso x2     two chained conv3x3_deint_stream back to back (per-op cost
             when the producer is the same Pallas kernel — the
             decoder's situation)

Usage: python tools/conv2_seam_bench.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from transformerupscaler_tpu.ops.conv import conv2d_packed_dots_deint
    from transformerupscaler_tpu.ops.pallas.stream import conv3x3_deint_stream

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    xp = jax.random.uniform(key, (1, 720, 640, 6), dt)
    xd = jax.random.uniform(key, (1, 720, 4, 160, 128), dt)
    k1 = jax.random.normal(key, (3, 3, 3, 64), jnp.float32) * 0.1
    k2 = jax.random.normal(key, (3, 3, 64, 64), jnp.float32) * 0.05
    b64 = jax.random.normal(key, (64,), jnp.float32) * 0.01
    print(f"device: {jax.devices()[0]}", flush=True)

    probe("iso: conv3x3_deint_stream",
          lambda p, v: conv3x3_deint_stream(v, k2, b64, relu=True),
          None, xd, K, log=print)
    probe("iso x2: deint_stream(deint_stream(x))",
          lambda p, v: conv3x3_deint_stream(
              conv3x3_deint_stream(v, k2, b64, relu=True), k2, b64,
              relu=True),
          None, xd, K, log=print)
    probe("conv1 only (dots deint)",
          lambda p, v: conv2d_packed_dots_deint(v, k1, b64, relu=True),
          None, xp, K, log=print)
    probe("conv1 -> conv2 chain",
          lambda p, v: conv3x3_deint_stream(
              conv2d_packed_dots_deint(v, k1, b64, relu=True), k2, b64,
              relu=True),
          None, xp, K, log=print)

    # Warm-context rows sweep: vary the SECOND conv's slab height (the
    # first stays 16) — the shipped 16 came from the round-3 cold sweep
    # of conv3x3_packed_stream.
    for rows in (8, 24, 48, 80):
        probe(f"iso x2, second conv rows={rows}",
              lambda p, v, r=rows: conv3x3_deint_stream(
                  conv3x3_deint_stream(v, k2, b64, relu=True), k2, b64,
                  relu=True, rows=r),
              None, xd, K, log=print)


if __name__ == "__main__":
    main()
