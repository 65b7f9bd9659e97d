#!/usr/bin/env python
"""Same-process A/B of the Pallas tail kernels, bf16 vs int8, plus the
conv3x3_deint_stream int8-emit epilogue — the staged "tails scope" win
(estimated ~1.9 ms from XLA int8 numbers) did NOT show up in-model
(8.606 vs 8.629 ms); this isolates which stage ate it.

Usage: python tools/int8_tail_bench.py [K]
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
        embed_stream,
        tail_macro8_stream,
        tail_macro8_stream_int8,
        unembed_combine_stream,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    h, g = 720, 160
    xd = jax.random.uniform(key, (1, h, 4, g, 128), dt)
    xq = jax.random.randint(key, (1, h, 4, g, 128), -127, 128, jnp.int8)
    scl = jnp.full((64,), 0.01, jnp.float32)
    k5 = jax.random.uniform(key, (5, 5, 64, 12), jnp.float32) * 0.05
    k7 = jax.random.uniform(key, (7, 7, 64, 12), jnp.float32) * 0.05
    k3 = jax.random.uniform(key, (3, 3, 64, 64), jnp.float32) * 0.05
    b12 = jnp.zeros((12,), jnp.float32)
    b64 = jnp.zeros((64,), jnp.float32)
    print(f"device: {jax.devices()[0]}", flush=True)

    probe("bf16 tail 5x5 (Pallas)",
          lambda p, v: tail_macro8_stream(v, k5, b12, relu=True),
          None, xd, K, log=print)
    probe("int8 tail 5x5 (Pallas)",
          lambda p, v: tail_macro8_stream_int8(v, k5, scl, b12, relu=True,
                                               out_dtype=dt),
          None, xq, K, log=print)
    probe("bf16 tail 7x7 (Pallas)",
          lambda p, v: tail_macro8_stream(v, k7, b12),
          None, xd, K, log=print)
    probe("int8 tail 7x7 (Pallas)",
          lambda p, v: tail_macro8_stream_int8(v, k7, scl, b12,
                                               out_dtype=dt),
          None, xq, K, log=print)
    probe("conv3x3 deint bf16-out",
          lambda p, v: conv3x3_deint_stream(v, k3, b64, relu=True),
          None, xd, K, log=print)
    probe("conv3x3 deint int8-out (epilogue quant)",
          lambda p, v: conv3x3_deint_stream(v, k3, b64, relu=True,
                                            out_scale=scl),
          None, xd, K, log=print)
    d = 192
    ke = jax.random.uniform(key, (8, 8, 64, d), jnp.float32) * 0.05
    be = jnp.zeros((d,), jnp.float32)
    probe("embed bf16-in",
          lambda p, v: embed_stream(v, ke, be),
          None, xd, K, log=print)
    probe("embed int8-in (deq in-kernel)",
          lambda p, v: embed_stream(v, ke, be, in_scale=scl, out_dtype=dt),
          None, xq, K, log=print)
    tok = jax.random.uniform(key, (1, h // 8, g, d), dt)
    ku = jax.random.uniform(key, (d, 8, 8, 64), jnp.float32) * 0.05
    bu = jnp.zeros((64,), jnp.float32)
    probe("unembed+combine bf16 skip",
          lambda p, v: unembed_combine_stream(v, xd, ku, bu),
          None, tok, K, log=print)
    probe("unembed+combine int8 skip (deq)",
          lambda p, v: unembed_combine_stream(v, xq, ku, bu, feat_scale=scl),
          None, tok, K, log=print)


def chains():
    """Composed chains: conv producer -> tail consumer, as wired in-model.
    Isolates crossing/relayout effects invisible to standalone probes."""
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    from transformerupscaler_tpu.ops.conv import conv2d_tail_packed_int8
    from transformerupscaler_tpu.ops.pallas.stream import (
        conv3x3_deint_stream,
        interleave4,
        tail_macro8_stream,
        tail_macro8_stream_int8,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    h, g = 720, 160
    xd = jax.random.uniform(key, (1, h, 4, g, 128), dt)
    scl = jnp.full((64,), 0.01, jnp.float32)
    k3 = jax.random.uniform(key, (3, 3, 64, 64), jnp.float32) * 0.05
    k5 = jax.random.uniform(key, (5, 5, 64, 12), jnp.float32) * 0.05
    b12 = jnp.zeros((12,), jnp.float32)
    b64 = jnp.zeros((64,), jnp.float32)
    print(f"device: {jax.devices()[0]}", flush=True)

    probe("chain bf16: deint conv -> Pallas tail5",
          lambda p, v: tail_macro8_stream(
              conv3x3_deint_stream(v, k3, b64, relu=True), k5, b12,
              relu=True),
          None, xd, K, log=print)
    probe("chain int8: deint conv(int8 out) -> Pallas int8 tail5",
          lambda p, v: tail_macro8_stream_int8(
              conv3x3_deint_stream(v, k3, b64, relu=True, out_scale=scl),
              k5, scl, b12, relu=True, out_dtype=dt),
          None, xd, K, log=print)
    probe("chain int8: deint conv(int8 out) -> inter4 -> XLA int8 tail5",
          lambda p, v: conv2d_tail_packed_int8(
              interleave4(conv3x3_deint_stream(v, k3, b64, relu=True,
                                               out_scale=scl)),
              k5, scl, b12, relu=True, out_dtype=dt, block=8),
          None, xd, K, log=print)
    probe("interleave4 int8 alone",
          lambda p, v: interleave4(conv3x3_deint_stream(
              v, k3, b64, relu=True, out_scale=scl)),
          None, xd, K, log=print)
    xq8 = jax.random.randint(key, (1, h, 640, 128), -127, 128, jnp.int8)
    probe("XLA int8 tail5 alone (packed int8 jit input)",
          lambda p, v: conv2d_tail_packed_int8(v, k5, scl, b12, relu=True,
                                               out_dtype=dt, block=8),
          None, xq8, K, log=print)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "chains":
        chains()
    else:
        main()
