#!/usr/bin/env python
"""Diagnose the conv1_dots_stream split at 720p (one process).

Round-5 first capture (tools/conv1_bench.py): stream 0.996 ms vs
shipping dots+deint 0.633 — with the xe-based tap expansion alone at
0.369 ms (narrow-minor padded intermediate suspected). This pins:

  imF flat    the rewritten pure-reshape flat-row tap expansion
  kernel r=N  conv1_stream_call alone (prebuilt im), rows sweep
  stream      full conv1_dots_stream (flat imF + best kernel)
  ship        conv2d_packed_dots_deint baseline

Usage: python tools/conv1_sweep.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from transformerupscaler_tpu.ops.conv import conv2d_packed_dots_deint
    from transformerupscaler_tpu.ops.pallas.stream import (
        conv1_dots_stream,
        conv1_im2col,
        conv1_stream_call,
        pack_conv1_dots,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    xp = x.reshape(1, 720, 640, 6)
    k = jax.random.normal(key, (3, 3, 3, 64), jnp.float32) * 0.1
    bias = jax.random.normal(key, (64,), jnp.float32) * 0.01
    print(f"device: {jax.devices()[0]}", flush=True)

    probe("ship: dots+deint", lambda p, v: conv2d_packed_dots_deint(
        v, k, bias, relu=True), None, xp, K, log=print)
    probe("imF flat tap expansion alone",
          lambda p, v: conv1_im2col(v), None, xp, K, log=print)

    w = pack_conv1_dots(k).astype(dt)
    bp = jnp.tile(jnp.asarray(bias, jnp.float32).reshape(1, 64), (1, 8))
    im = jax.jit(conv1_im2col)(xp)
    im.block_until_ready()
    for rows in (8, 16, 24, 48):
        probe(f"kernel only rows={rows}",
              lambda p, v, r=rows: conv1_stream_call(v, w, bp, relu=True,
                                                     rows=r),
              None, im, K, log=print)

    probe("stream full (flat imF)",
          lambda p, v: conv1_dots_stream(v, k, bias, relu=True),
          None, xp, K, log=print)

    from transformerupscaler_tpu.ops.pallas.stream import conv1_flat_stream

    for rows in (8, 16):
        probe(f"v2 flat-input kernel rows={rows}",
              lambda p, v, r=rows: conv1_flat_stream(v, k, bias, relu=True,
                                                     rows=r),
              None, xp, K, log=print)


if __name__ == "__main__":
    main()
