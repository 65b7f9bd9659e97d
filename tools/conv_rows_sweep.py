#!/usr/bin/env python
"""Rows sweep for the deint-native stream kernels at the headline geometry.

conv3x3_deint_stream shipped with rows=16 untuned; the tails were swept at
24. Same-process sweep so the comparisons are trustworthy (cross-process
variance ~±0.3 ms, memory/tpu-axon-environment.md).

Usage: python tools/conv_rows_sweep.py [K]
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
        conv3x3_deint_stream,
        tail_macro8_stream,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    h, g = 720, 160
    xd = jax.random.uniform(key, (1, h, 4, g, 128), dt)
    k3 = jax.random.uniform(key, (3, 3, 64, 64), jnp.float32) * 0.05
    k7 = jax.random.uniform(key, (7, 7, 64, 12), jnp.float32) * 0.05
    b64 = jnp.zeros((64,), jnp.float32)
    b12 = jnp.zeros((12,), jnp.float32)
    print(f"device: {jax.devices()[0]}", flush=True)

    which = set(sys.argv[2:]) or {"conv", "tail7"}
    if "conv" in which:
        for rows in (8, 16, 24, 36, 48, 80):
            probe(f"conv3x3 deint rows={rows}",
                  lambda p, v, r=rows: conv3x3_deint_stream(v, k3, b64,
                                                            relu=True,
                                                            rows=r),
                  None, xd, K, log=print)
    if "tail7" in which:
        for rows in (16, 24, 48):
            probe(f"tail 7x7 rows={rows}",
                  lambda p, v, r=rows: tail_macro8_stream(v, k7, b12,
                                                          rows=r),
                  None, xd, K, log=print)
    if "tail5" in which:
        k5 = jax.random.uniform(key, (5, 5, 64, 12), jnp.float32) * 0.05
        for rows in (12, 16, 24, 36):
            probe(f"tail 5x5 rows={rows}",
                  lambda p, v, r=rows: tail_macro8_stream(v, k5, b12,
                                                          relu=True,
                                                          rows=r),
                  None, xd, K, log=print)


if __name__ == "__main__":
    main()
