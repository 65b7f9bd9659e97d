#!/usr/bin/env python
"""Device bench: Pallas embed/unembed stream kernels vs the XLA packed
formulations at the headline geometry (720p, ps=8, D=64).

Usage: python tools/patch_stream_bench.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from transformerupscaler_tpu.ops.patch import (
        patch_embed_packed,
        patch_unembed_packed,
    )
    from transformerupscaler_tpu.ops.pallas.stream import (
        deinterleave4,
        embed_stream,
        interleave4,
        unembed_combine_stream,
    )

    from transformerupscaler_tpu.ops.conv import conv2d_packed_raw

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h, wp2, c2 = 720, 640, 128
    ht, wt, d = 90, 160, 192  # transformer_dim = 192
    featp = jax.random.uniform(k1, (1, h, wp2, c2), dt)
    featd = deinterleave4(featp)
    tokens = jax.random.uniform(k2, (1, ht, wt, d), dt)
    ke = jax.random.uniform(k3, (8, 8, 64, d), dt) * 0.05
    be = jnp.zeros((d,), dt)
    ku = jax.random.uniform(k4, (d, 8, 8, 64), dt) * 0.05
    bu = jnp.zeros((64,), dt)
    kc = jax.random.uniform(key, (3, 3, 64, 64), dt) * 0.05
    bc = jnp.zeros((64,), dt)
    print(f"device: {jax.devices()[0]}", flush=True)

    # CAUTION: the abs-sum feedback is permutation-invariant, so a probe
    # whose chain ENDS in a pure layout op (the unembed scatter transpose)
    # lets XLA delete that transpose and fabricates a fast number (measured:
    # 0.087 ms for an op that costs 2.1 in context). Every unembed probe
    # therefore feeds a 3x3 packed conv consumer (NOT commutable with the
    # spatial permutation), and the conv's cost is reported separately for
    # subtraction.
    probe("consumer alone: conv3x3 packed",
          lambda p, v: conv2d_packed_raw(v, kc, bc, relu=True), None, featp,
          K, log=print)
    probe("XLA patch_embed_packed",
          lambda p, v: patch_embed_packed(v, ke, be), None, featp, K,
          log=print)
    probe("Pallas embed_stream (featd resident)",
          lambda p, v: embed_stream(v, ke, be), None, featd, K, log=print)
    probe("deint + Pallas embed_stream",
          lambda p, v: embed_stream(deinterleave4(v), ke, be), None, featp,
          K, log=print)

    probe("XLA unembed+add -> conv",
          lambda p, tk: conv2d_packed_raw(
              patch_unembed_packed(tk, ku, bu) + featp, kc, bc, relu=True),
          None, tokens, K, log=print)
    probe("Pallas unembed_combine -> interleave4 -> conv",
          lambda p, tk: conv2d_packed_raw(
              interleave4(unembed_combine_stream(tk, featd, ku, bu)),
              kc, bc, relu=True),
          None, tokens, K, log=print)


if __name__ == "__main__":
    main()
