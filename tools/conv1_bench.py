#!/usr/bin/env python
"""Op-level cost of the serving conv1 routings at 720p (one process).

The r4 stage log attributes 0.807 ms to "conv1 dots (deint out)" but the
trunk taught us chained-stage deltas misattribute — this pins conv1's
real op-level cost and its traffic bound. Probes (chained abs-sum):

  dots+deint   conv2d_packed_dots_deint (the shipping serving conv1)
  dots         conv2d_packed_dots (default layout) — the 0.48 ms r3 number
  emitter      lax conv via ops.conv.conv2d (reference form)
  stream       conv1_dots_stream (round 5: XLA tap expansion + one-dot
               Pallas row stream; kills the 118 MB lane-padded im2col)
  imF          the conv1_im2col tap expansion alone (stream's XLA side)
  model A/B    full serving model, conv1_stream off vs on

Traffic bound: old path 118 MB output write + ~118 MB PHYSICAL im2col
w+r (54-lane minor dim pads to 128 in TPU tiled layouts) + 11 MB input
~ 0.45 ms at 800 GB/s; stream path 118 + ~2x30 + 11 ~ 0.22 ms.

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

    from transformerupscaler_tpu.ops.pallas.stream import (
        conv1_dots_stream,
        conv1_im2col,
    )

    probe("conv1 stream (imF + one-dot pallas)",
          lambda p, v: conv1_dots_stream(v, k, bias, relu=True),
          None, xp, K, log=print)
    probe("conv1 imF tap expansion alone",
          lambda p, v: conv1_im2col(v), None, xp, K, log=print)

    # In-model A/B: the full serving forward with the old vs new conv1.
    from transformerupscaler_tpu.registry import get_model

    res_out = (1080, 1920)
    params = get_model("FastTransformer", dtype=dt, compose_tails=True
                       ).init(jax.random.PRNGKey(0), x, res_out=res_out)
    for name, flag in (("model conv1_stream=False", False),
                       ("model conv1_stream=True", True)):
        m = get_model("FastTransformer", dtype=dt, compose_tails=True,
                      pallas_serve=True, attn_impl="fused2",
                      conv1_stream=flag)
        per = probe(name, lambda p, v: m.apply(p, v, res_out=res_out),
                    params, x, K, log=print)
        print(f"    -> {1.0 / per:8.2f} fps", flush=True)


if __name__ == "__main__":
    main()
