#!/usr/bin/env python
"""Per-op device microbenchmarks for the FastTransformer 720p pipeline.

The tunneled PJRT backend resolves block_until_ready optimistically, so the
only trustworthy timing is a host fetch behind a data dependency. Each probe
chains M applications of the op inside one jit (scan-style fori_loop) and
differences M=1 vs M=K timings to cancel the RPC round trip.

Usage: python tools/op_bench.py [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, params, x, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(fn(params, x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chained(apply_fn, M):
    """apply_fn: (params, x) -> y (any shape); chain via FULL-sum feedback.

    The sum consumes every output element so XLA cannot shrink the op to the
    dependency cone of a single pixel (a scalar-element chain measurably
    triggers that). The sum pass itself costs ~0.1-0.3 ms — subtract an
    identity probe for ops near that scale.
    """
    def fn(p, x):
        def body(i, carry):
            y = apply_fn(p, carry)
            # abs: plain sums get pushed through linear ops (probe_lib.py).
            s = jnp.sum(jnp.abs(y.astype(jnp.float32)))
            return carry + (s != s).astype(carry.dtype)
        return jnp.ravel(lax.fori_loop(0, M, body, x))[0]
    return jax.jit(fn)


def probe(name, apply_fn, params, x, K=8):
    f1, fK = chained(apply_fn, 1), chained(apply_fn, K)
    _ = np.asarray(f1(params, x))
    _ = np.asarray(fK(params, x))
    t1, tK = timed(f1, params, x), timed(fK, params, x)
    per = (tK - t1) / (K - 1)
    print(f"{name:34s} {per * 1e3:8.3f} ms", flush=True)
    return per


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from transformerupscaler_tpu.registry import get_model
    from transformerupscaler_tpu.ops.conv import conv2d
    from transformerupscaler_tpu.ops.patch import patch_embed, patch_unembed
    from transformerupscaler_tpu.ops.resize import resize_antialias_bilinear
    from transformerupscaler_tpu.models.common import run_window_trunk

    dt = jnp.bfloat16
    model = get_model("FastTransformer", dtype=dt)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    params = model.init(key, x, res_out=(1080, 1920))
    p = params["params"]
    bound = model.bind(params)

    feat = jnp.zeros((1, 720, 1280, 64), dt)
    tokens = jnp.zeros((1, 90, 160, 192), dt)
    rgb1440 = jnp.zeros((1, 1440, 2560, 3), dt)

    probe("full model 720p->1080p",
          lambda pp, v: model.apply(pp, v, res_out=(1080, 1920)), params, x, K)
    probe("encoder conv1 3->64",
          lambda pp, v: conv2d(v, pp["params"]["conv1"]["kernel"].astype(dt),
                               pp["params"]["conv1"]["bias"], relu=True), params, x, K)
    probe("conv 64->64 @720p (x3 in model)",
          lambda pp, v: conv2d(v, pp["params"]["conv2"]["kernel"].astype(dt),
                               pp["params"]["conv2"]["bias"], relu=True), params, feat, K)
    probe("up1 + fused RGB tail",
          lambda pp, v: bound.up1(v, 2, tail_kernel=pp["params"]["up1_conv_kernel"].astype(dt),
                                  tail_relu=True), params, feat, K)
    probe("patch_embed k8s8 64->192",
          lambda pp, v: patch_embed(v, pp["params"]["patch_embed_kernel"].astype(dt),
                                    pp["params"]["patch_embed_bias"]), params, feat, K)
    probe("window trunk (6 blocks)",
          lambda pp, v: run_window_trunk(v, bound.blocks, 8), params, tokens, K)
    probe("patch_unembed 192->64",
          lambda pp, v: patch_unembed(v, pp["params"]["patch_unembed_kernel"].astype(dt),
                                      pp["params"]["patch_unembed_bias"]), params, tokens, K)
    probe("decoder_conv2 64->3 @720p",
          lambda pp, v: conv2d(v, pp["params"]["decoder_conv2"]["kernel"].astype(dt),
                               pp["params"]["decoder_conv2"]["bias"]), params, feat, K)
    rgb720 = jnp.zeros((1, 720, 1280, 3), dt)
    probe("final_upscale + fused tail",
          lambda pp, v: bound.final_upscale(
              v, 2, tail_kernel=pp["params"]["final_upscale_conv_kernel"].astype(dt),
              tail_bias=pp["params"]["final_upscale_conv_bias"].astype(dt)),
          params, rgb720, K)
    probe("squash resize 1440p->1080p",
          lambda pp, v: resize_antialias_bilinear(v, (1080, 1920)), params, rgb1440, K)
    probe("add+clamp @1440p",
          lambda pp, v: jnp.clip(v + v, 0.0, 1.0), params, rgb1440, K)

if __name__ == "__main__":
    main()
