#!/usr/bin/env python
"""Packed-serving-path probes (round 2): the all-XLA width-2-packed pipeline
vs the compose_tails baseline, full-model and per-stage.

Usage: python tools/packed_bench.py [K] [probe ...]
Probes: full fullb4 compose tail5 tail7 conv embedp
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe

FLUSH = dict(flush=True)


def log(msg):
    print(msg, **FLUSH)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    which = set(sys.argv[2:]) or {"full", "fullb4", "tail5", "tail7",
                                  "conv", "embedp", "int8mlp", "convint8"}
    from transformerupscaler_tpu.registry import get_model

    dt = jnp.bfloat16
    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    base = get_model("FastTransformer", dtype=dt, compose_tails=True)
    params = base.init(key, x, res_out=res_out)
    log(f"device: {jax.devices()[0]}")

    mp = get_model("FastTransformer", dtype=dt, compose_tails=True,
                   packed_serve=True)
    if "full" in which:
        probe("full packed_serve bf16",
              lambda pp, v: mp.apply(pp, v, res_out=res_out),
              params, x, K, log=log)
    if "fullb4" in which:
        xb = jax.random.uniform(key, (4, 720, 1280, 3), dt)
        per = probe("full packed_serve bf16 batch=4",
                    lambda pp, v: mp.apply(pp, v, res_out=res_out),
                    params, xb, K, log=log)
        log(f"{'':52s} -> {4 / per:8.2f} fps aggregate")
    if "int8mlp" in which:
        m8 = get_model("FastTransformer", dtype=dt, compose_tails=True,
                       packed_serve=True, int8_mlp=True)
        probe("full packed + int8 trunk MLPs",
              lambda pp, v: m8.apply(pp, v, res_out=res_out),
              params, x, K, log=log)
    if "compose" in which:
        probe("full compose bf16 (baseline)",
              lambda pp, v: base.apply(pp, v, res_out=res_out),
              params, x, K, log=log)
    for name in sorted(which):
        if name.startswith("batch"):
            nb = int(name[5:])
            xb = jax.random.uniform(key, (nb, 720, 1280, 3), dt)
            per = probe(f"full compose bf16 batch={nb}",
                        lambda pp, v: base.apply(pp, v, res_out=res_out),
                        params, xb, K, log=log)
            log(f"{'':52s} -> {nb / per:8.2f} fps aggregate")

    from transformerupscaler_tpu.ops.conv import (
        conv2d,
        conv2d_packed_raw,
        conv2d_tail_packed,
    )

    feat = jax.random.uniform(key, (1, 720, 1280, 64), dt)
    featp = feat.reshape(1, 720, 640, 128)
    if "tail5" in which or "tail7" in which:
        for kw in (5, 7):
            if f"tail{kw}" not in which:
                continue
            k = jax.random.uniform(key, (kw, kw, 64, 12), dt) * 0.1
            b = jax.random.uniform(key, (12,), dt)
            probe(f"tail {kw}x{kw} 64->12 macro-8 (XLA unpacked)",
                  lambda pp, v, k=k, b=b: conv2d(
                      v, k, b, padding=(kw - 1) // 2, relu=True),
                  params, feat, K, log=log)
            probe(f"tail {kw}x{kw} 64->12 stride-4 packed",
                  lambda pp, v, k=k, b=b: conv2d_tail_packed(
                      v, k, b, relu=True),
                  params, featp, K, log=log)
    if "conv" in which:
        k2 = params["params"]["conv2"]["kernel"].astype(dt)
        b2 = params["params"]["conv2"]["bias"]
        probe("conv3x3 64->64 plain (XLA)",
              lambda pp, v: conv2d(v, k2, b2, relu=True, auto_macro=False),
              params, feat, K, log=log)
        probe("conv3x3 64->64 packed_raw",
              lambda pp, v: conv2d_packed_raw(v, k2, b2, relu=True),
              params, featp, K, log=log)
    if "convint8" in which:
        from jax import lax
        k2 = params["params"]["conv2"]["kernel"].astype(dt)
        b2 = params["params"]["conv2"]["bias"]

        def conv_int8(pp, v):
            # int8 x int8 -> int32 MXU conv with dynamic activation quant.
            xs = jnp.maximum(jnp.max(jnp.abs(v)), 1e-8) / 127.0
            xq = jnp.clip(jnp.round(v / xs), -127, 127).astype(jnp.int8)
            ws = jnp.maximum(jnp.max(jnp.abs(k2)), 1e-8) / 127.0
            wq = jnp.clip(jnp.round(k2 / ws), -127, 127).astype(jnp.int8)
            dn = lax.conv_dimension_numbers(v.shape, wq.shape,
                                            ("NHWC", "HWIO", "NHWC"))
            acc = lax.conv_general_dilated(
                xq, wq, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (xs * ws)).astype(dt) + b2

        probe("conv3x3 64->64 int8 (XLA dyn quant)", conv_int8,
              params, feat, K, log=log)
    if "embedp" in which:
        from transformerupscaler_tpu.ops.patch import (
            patch_embed,
            patch_embed_packed,
            patch_unembed,
            patch_unembed_packed,
        )
        ke = params["params"]["patch_embed_kernel"].astype(dt)
        be = params["params"]["patch_embed_bias"]
        ku = params["params"]["patch_unembed_kernel"].astype(dt)
        bu = params["params"]["patch_unembed_bias"]
        tokens = jax.random.uniform(key, (1, 90, 160, 192), dt)
        probe("patch_embed XLA", lambda pp, v: patch_embed(v, ke, be),
              params, feat, K, log=log)
        probe("patch_embed packed",
              lambda pp, v: patch_embed_packed(v, ke, be),
              params, featp, K, log=log)
        probe("patch_unembed XLA", lambda pp, v: patch_unembed(v, ku, bu),
              params, tokens, K, log=log)
        probe("patch_unembed packed",
              lambda pp, v: patch_unembed_packed(v, ku, bu),
              params, tokens, K, log=log)


if __name__ == "__main__":
    main()
