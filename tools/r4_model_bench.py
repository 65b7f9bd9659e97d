#!/usr/bin/env python
"""Round-4 candidates at the headline geometry (720p -> 1080p 2x).

In-model configs (same process, chained abs-sum probes):
  base      bf16 pallas + paired fused2 trunk (the shipped headline)
  quality   serve_quality: f32 input + hi/lo conv1, f32 tails, HIGHEST
            squash — the joint-north-star candidate
  chunk     TUX_TRUNK_CHUNK=1: per-pair chunked trunk layer bodies
            (VPU/MXU overlap experiment)
  qchunk    quality + chunk

Op-level probes:
  trunkop   paired vs chunked fused2 trunk at wpc 4/8/12
  squash    resize_shuffled at the headline shape: bf16, f32-default,
            f32 HIGH, f32 HIGHEST
  conv1     conv2d_packed_dots_deint normal vs hi_lo

Usage: python tools/r4_model_bench.py [K] [probe names...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    which = set(sys.argv[2:]) or {"base", "quality", "chunk", "qchunk",
                                  "trunkop", "squash", "conv1"}
    from transformerupscaler_tpu.registry import get_model

    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    xb = jax.random.uniform(key, (1, 720, 1280, 3), jnp.bfloat16)
    xf = jax.random.uniform(key, (1, 720, 1280, 3), jnp.float32)
    base = get_model("FastTransformer", dtype=jnp.bfloat16,
                     compose_tails=True)
    params = base.init(key, xb, res_out=res_out)
    print(f"device: {jax.devices()[0]}", flush=True)

    def run(name, x, **kw):
        m = get_model("FastTransformer", dtype=jnp.bfloat16,
                      compose_tails=True, pallas_serve=True,
                      attn_impl="fused2", **kw)
        per = probe(name, lambda p, v: m.apply(p, v, res_out=res_out),
                    params, x, K, log=print)
        print(f"    -> {1.0 / per:8.2f} fps", flush=True)

    if "base" in which:
        run("bf16 pallas + paired fused2 (headline)", xb)
    if "quality" in which:
        run("serve_quality (f32 image path)", xf, serve_quality=True)
    if "chunk" in which:
        os.environ["TUX_TRUNK_CHUNK"] = "1"
        run("headline + chunked trunk", xb)
        del os.environ["TUX_TRUNK_CHUNK"]
    if "qchunk" in which:
        os.environ["TUX_TRUNK_CHUNK"] = "1"
        run("serve_quality + chunked trunk", xf, serve_quality=True)
        del os.environ["TUX_TRUNK_CHUNK"]

    if "trunkop" in which:
        from transformerupscaler_tpu.models.common import WindowBlock
        from transformerupscaler_tpu.ops.pallas.trunk2 import (
            fused_window_trunk_v2,
        )

        dt = jnp.bfloat16
        d, heads, ws = 192, 12, 8
        win = jax.random.uniform(key, (225, ws * ws, d), dt)
        blk = WindowBlock(d, ws, heads, 4.0, 0.0, dtype=dt)
        bp = blk.init(jax.random.PRNGKey(1), win)["params"]
        bps = [bp] * 6
        for wpc in (4, 8, 12):
            probe(f"trunk paired wpc={wpc}",
                  lambda p, v, w=wpc: fused_window_trunk_v2(
                      v, bps, heads, ws, windows_per_cell=w, pair=True),
                  {}, win, K, log=print)
        os.environ["TUX_TRUNK_CHUNK"] = "1"
        for wpc in (4, 8, 12):
            probe(f"trunk CHUNKED wpc={wpc}",
                  lambda p, v, w=wpc: fused_window_trunk_v2(
                      v, bps, heads, ws, windows_per_cell=w, pair=True),
                  {}, win, K, log=print)
        del os.environ["TUX_TRUNK_CHUNK"]

    if "squash" in which:
        from transformerupscaler_tpu.ops.resize import resize_shuffled

        z_b = jax.random.uniform(key, (1, 720, 640, 12), jnp.bfloat16)
        z_f = z_b.astype(jnp.float32)
        probe("squash bf16 default", lambda p, v: resize_shuffled(
            v, 2, res_out), {}, z_b, K, log=print)
        probe("squash f32 default-prec", lambda p, v: resize_shuffled(
            v, 2, res_out), {}, z_f, K, log=print)
        probe("squash f32 HIGH", lambda p, v: resize_shuffled(
            v, 2, res_out, precision=jax.lax.Precision.HIGH),
            {}, z_f, K, log=print)
        probe("squash f32 HIGHEST", lambda p, v: resize_shuffled(
            v, 2, res_out, precision=jax.lax.Precision.HIGHEST),
            {}, z_f, K, log=print)

    if "conv1" in which:
        from transformerupscaler_tpu.ops.conv import conv2d_packed_dots_deint

        p1 = params["params"]["conv1"]
        k1 = jnp.asarray(p1["kernel"], jnp.float32)
        b1 = jnp.asarray(p1["bias"], jnp.float32)
        xp_b = xb.reshape(1, 720, 640, 6)
        xp_f = xf.reshape(1, 720, 640, 6)
        probe("conv1 dots_deint bf16", lambda p, v: conv2d_packed_dots_deint(
            v, k1.astype(jnp.bfloat16), b1, relu=True), {}, xp_b, K,
            log=print)
        probe("conv1 dots_deint HI/LO", lambda p, v: conv2d_packed_dots_deint(
            v, k1, b1, relu=True, hi_lo=True), {}, xp_f, K, log=print)
        xq = (xf * jnp.float32(255.0)).astype(jnp.bfloat16).reshape(
            1, 720, 640, 6)
        probe("conv1 dots_deint K_HI_LO u8",
              lambda p, v: conv2d_packed_dots_deint(
                  v, k1, b1, relu=True, k_hi_lo=True, pre_scale=1.0 / 255.0),
              {}, xq, K, log=print)


if __name__ == "__main__":
    main()
