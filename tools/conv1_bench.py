#!/usr/bin/env python
"""Op-level cost of the serving conv1 routings at 720p (one process).

The r4 stage log attributes 0.807 ms to "conv1 dots (deint out)" but the
trunk taught us chained-stage deltas misattribute — this pins conv1's
real op-level cost and its traffic bound. Probes (chained abs-sum):

  dots+deint   conv2d_packed_dots_deint (the shipping serving conv1)
  dots         conv2d_packed_dots (default layout) — the 0.48 ms r3 number
  emitter      lax conv via ops.conv.conv2d (reference form)

Traffic bound: 118 MB output write + ~50 MB im2col w+r + 11 MB input
~ 0.23 ms at 800 GB/s.

Usage: python tools/conv1_bench.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from transformerupscaler_tpu.ops.conv import (
        conv2d_packed_dots,
        conv2d_packed_dots_deint,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    xp = x.reshape(1, 720, 640, 6)
    k = jax.random.normal(key, (3, 3, 3, 64), jnp.float32) * 0.1
    bias = jax.random.normal(key, (64,), jnp.float32) * 0.01
    print(f"device: {jax.devices()[0]}", flush=True)

    probe("conv1 dots+deint (shipping)",
          lambda p, v: conv2d_packed_dots_deint(v, k, bias, relu=True),
          None, xp, K, log=print)
    probe("conv1 dots (default layout)",
          lambda p, v: conv2d_packed_dots(v, k, bias, relu=True),
          None, xp, K, log=print)
    from transformerupscaler_tpu.ops.conv import conv2d

    probe("conv1 emitter (lax conv)",
          lambda p, v: conv2d(v, k.astype(dt), bias, relu=True,
                              padding=1),
          None, x, K, log=print)


if __name__ == "__main__":
    main()
