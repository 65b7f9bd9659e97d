#!/usr/bin/env python
"""Minimal repro for the int8-conv x Pallas-custom-call interaction.

int8+pallas at model level measured 20-24 ms vs 10.3 all-XLA int8 and 11.5
all-Pallas bf16 — adding ONE Pallas patch kernel to the int8 graph costs
+10 ms. This isolates: int8 conv feeding (a) XLA patch embed, (b) Pallas
embed_stream, (c) nothing; and bf16 conv feeding the same.

Usage: python tools/int8_pallas_iso.py [K]
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
        conv2d_packed_raw,
    )
    from transformerupscaler_tpu.ops.patch import patch_embed_packed
    from transformerupscaler_tpu.ops.pallas.stream import (
        deinterleave4,
        embed_stream,
    )
    from transformerupscaler_tpu.ops.quant import quantize_act_ch

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    h, wp2 = 720, 640
    x = jax.random.uniform(key, (1, h, wp2, 128), dt)
    k = jax.random.uniform(key, (3, 3, 64, 64), jnp.float32) * 0.05
    b = jnp.zeros((64,), jnp.float32)
    ke = jax.random.uniform(key, (8, 8, 64, 192), dt) * 0.05
    be = jnp.zeros((192,), dt)
    scl = jnp.full((64,), 0.01, jnp.float32)
    print(f"device: {jax.devices()[0]}", flush=True)

    def qconv(v):
        q, _ = quantize_act_ch(v, jnp.tile(scl, 2))
        return conv2d_packed_int8(q, k, scl, b, relu=True, out_dtype=dt)

    probe("int8 conv alone",
          lambda p, v: qconv(v), None, x, K, log=print)
    probe("int8 conv -> XLA patch_embed",
          lambda p, v: patch_embed_packed(qconv(v), ke, be), None, x, K,
          log=print)
    probe("int8 conv -> deint -> Pallas embed_stream",
          lambda p, v: embed_stream(deinterleave4(qconv(v)), ke, be), None,
          x, K, log=print)
    probe("bf16 conv -> deint -> Pallas embed_stream",
          lambda p, v: embed_stream(deinterleave4(
              conv2d_packed_raw(v, k.astype(dt), b, relu=True)), ke, be),
          None, x, K, log=print)
    probe("int8 conv -> deint(XLA transpose) only",
          lambda p, v: deinterleave4(qconv(v)), None, x, K, log=print)
    probe("int8 conv -> barrier -> deint -> embed_stream",
          lambda p, v: embed_stream(deinterleave4(
              jax.lax.optimization_barrier(qconv(v))), ke, be), None, x, K,
          log=print)
    probe("int8 conv -> deint -> barrier -> embed_stream",
          lambda p, v: embed_stream(
              jax.lax.optimization_barrier(deinterleave4(qconv(v))), ke, be),
          None, x, K, log=print)
    probe("int8 conv -> deint -> +0 -> embed_stream",
          lambda p, v: embed_stream(
              deinterleave4(qconv(v)) + jnp.zeros((), dt), ke, be),
          None, x, K, log=print)


if __name__ == "__main__":
    main()
