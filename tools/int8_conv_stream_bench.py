#!/usr/bin/env python
"""Standalone speed of conv3x3_packed_int8_stream vs its neighbors at the
headline geometry (int8 input pre-quantized with static scales, as in the
calibrated serving path).

Usage: python tools/int8_conv_stream_bench.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    from transformerupscaler_tpu.ops.conv import conv2d_packed_int8
    from transformerupscaler_tpu.ops.pallas.stream import (
        conv3x3_packed_int8_stream,
        conv3x3_packed_stream,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    h, wp2 = 720, 640
    xq = jax.random.randint(key, (1, h, wp2, 128), -127, 128, jnp.int8)
    k = jax.random.uniform(key, (3, 3, 64, 64), jnp.float32) * 0.05
    b = jnp.zeros((64,), jnp.float32)
    scl = jnp.full((64,), 0.01, jnp.float32)
    xb = jax.random.uniform(key, (1, h, wp2, 128), dt)
    print(f"device: {jax.devices()[0]}", flush=True)

    # int8-in chains keep the carry bf16 by requantizing the output.
    def requant(y):
        return jnp.clip(jnp.round(y.astype(jnp.float32) / 0.01),
                        -127, 127).astype(jnp.int8)

    probe("Pallas int8 stream conv (int8 in, bf16 out)",
          lambda p, v: requant(conv3x3_packed_int8_stream(
              v, k, scl, b, relu=True, out_dtype=dt)),
          None, xq, K, log=print)
    probe("XLA int8 conv (int8 in, bf16 out)",
          lambda p, v: requant(conv2d_packed_int8(
              v, k, scl, b, relu=True, out_dtype=dt)),
          None, xq, K, log=print)
    probe("Pallas bf16 stream conv (reference)",
          lambda p, v: conv3x3_packed_stream(v, k.astype(dt), b, relu=True),
          None, xb, K, log=print)
    for rows in (8, 24, 32):
        probe(f"Pallas int8 stream conv rows={rows}",
              lambda p, v, rows=rows: requant(conv3x3_packed_int8_stream(
                  v, k, scl, b, relu=True, out_dtype=dt, rows=rows)),
              None, xq, K, log=print)


if __name__ == "__main__":
    main()
