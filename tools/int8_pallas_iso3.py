#!/usr/bin/env python
"""Pin the XLA<->Pallas crossing rule: which producer/consumer pairs pay
the relayout penalty.

Usage: python tools/int8_pallas_iso3.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    from transformerupscaler_tpu.ops.conv import (
        conv2d_packed_int8,
        conv2d_tail_packed_int8,
    )
    from transformerupscaler_tpu.ops.pallas.stream import (
        conv3x3_packed_stream,
        deinterleave4,
        embed_stream,
        tail_macro8_stream,
    )
    from transformerupscaler_tpu.ops.quant import quantize_act_ch

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    h, wp2 = 720, 640
    x = jax.random.uniform(key, (1, h, wp2, 128), dt)
    k = jax.random.uniform(key, (3, 3, 64, 64), jnp.float32) * 0.05
    b = jnp.zeros((64,), jnp.float32)
    kt = jax.random.uniform(key, (5, 5, 64, 12), jnp.float32) * 0.05
    bt = jnp.zeros((12,), jnp.float32)
    ke = jax.random.uniform(key, (8, 8, 64, 192), dt) * 0.05
    be = jnp.zeros((192,), dt)
    scl = jnp.full((64,), 0.01, jnp.float32)
    print(f"device: {jax.devices()[0]}", flush=True)

    def qconv(v):
        q, _ = quantize_act_ch(v, jnp.tile(scl, 2))
        return conv2d_packed_int8(q, k, scl, b, relu=True, out_dtype=dt)

    def pconv(v):
        return conv3x3_packed_stream(v, k.astype(dt), b, relu=True)

    probe("P1 int8 conv -> Pallas conv stream (4D cross)",
          lambda p, v: pconv(qconv(v)), None, x, K, log=print)
    probe("P2 Pallas conv -> int8 XLA tail (cross back)",
          lambda p, v: conv2d_tail_packed_int8(
              quantize_act_ch(pconv(v), jnp.tile(scl, 2))[0], kt, scl, bt,
              relu=True, out_dtype=dt, block=8),
          None, x, K, log=print)
    probe("P3 Pallas conv -> deint -> embed_stream (sanity)",
          lambda p, v: embed_stream(deinterleave4(pconv(v)), ke, be),
          None, x, K, log=print)
    probe("P4 int8 conv -> deint -> Pallas tail (5D cross)",
          lambda p, v: tail_macro8_stream(deinterleave4(qconv(v)), kt, bt,
                                          relu=True),
          None, x, K, log=print)


if __name__ == "__main__":
    main()
