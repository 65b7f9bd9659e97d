#!/usr/bin/env python
"""Round-2 perf decision probes: int8 candidates + batched serving.

Measures (chained full-sum probes, see tools/op_bench.py):
  - full compose serving at batch 1/4/8 (bf16)
  - full compose + int8 trunk MLPs (the reference's dynamic-quant scope,
    /root/reference/inference.py:111-113)
  - the 3x3 64->64 conv in bf16 vs true int8 (conv_general_dilated with
    int8 operands, int32 accumulation) — decides whether an int8 conv
    serving path is worth building.
  - patch embed GEMM bf16 vs int8.

Usage: python tools/int8_bench.py [K] [probe ...]
Probes: full int8mlp batch4 batch8 conv convint8 embed embedint8
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def chained(apply_fn, M):
    # abs-sum feedback: a plain full sum gets algebraically pushed through
    # purely-linear ops, fabricating fast numbers (see tools/probe_lib.py).
    def fn(p, x):
        def body(i, carry):
            y = apply_fn(p, carry)
            s = jnp.sum(jnp.abs(y.astype(jnp.float32)))
            return carry + (s != s).astype(carry.dtype)
        return jnp.ravel(lax.fori_loop(0, M, body, x))[0]
    return jax.jit(fn)


def timed(fn, params, x, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(fn(params, x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe(name, apply_fn, params, x, K):
    t0 = time.perf_counter()
    f1, fK = chained(apply_fn, 1), chained(apply_fn, K)
    _ = np.asarray(f1(params, x))
    _ = np.asarray(fK(params, x))
    tc = time.perf_counter() - t0
    t1, tK = timed(f1, params, x), timed(fK, params, x)
    per = (tK - t1) / (K - 1)
    print(f"{name:48s} {per * 1e3:8.3f} ms   (compile {tc:.0f}s)",
          flush=True)
    return per


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    which = set(sys.argv[2:]) or {"full", "int8mlp", "batch4", "batch8",
                                  "conv", "convint8", "embed", "embedint8"}
    from transformerupscaler_tpu.registry import get_model

    dt = jnp.bfloat16
    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    base = get_model("FastTransformer", dtype=dt, compose_tails=True)
    params = base.init(key, x, res_out=res_out)
    print(f"device: {jax.devices()[0]}", flush=True)

    if "full" in which:
        probe("full compose bf16",
              lambda pp, v: base.apply(pp, v, res_out=res_out), params, x, K)
    if "int8mlp" in which:
        m8 = get_model("FastTransformer", dtype=dt, compose_tails=True,
                       int8_mlp=True)
        probe("full compose + int8 trunk MLPs",
              lambda pp, v: m8.apply(pp, v, res_out=res_out), params, x, K)
    for name in sorted(which):
        if name.startswith("batch"):
            nb = int(name[5:])
            xb = jax.random.uniform(key, (nb, 720, 1280, 3), dt)
            per = probe(f"full compose bf16 batch={nb}",
                        lambda pp, v: base.apply(pp, v, res_out=res_out),
                        params, xb, K)
            print(f"{'':48s} -> {nb / per:8.2f} fps aggregate", flush=True)

    feat = jax.random.uniform(key, (1, 720, 1280, 64), dt)
    kconv = params["params"]["conv2"]["kernel"].astype(dt)
    bconv = params["params"]["conv2"]["bias"]

    def conv_bf16(pp, v):
        dn = lax.conv_dimension_numbers(v.shape, kconv.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            v, kconv, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn).astype(dt) + bconv.astype(dt)

    def conv_int8(pp, v):
        # dynamic per-tensor activation quant + per-tensor weight quant;
        # int8 x int8 -> int32 conv on the MXU, rescale to bf16.
        xs = jnp.maximum(jnp.max(jnp.abs(v)), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(v / xs), -127, 127).astype(jnp.int8)
        ws = jnp.maximum(jnp.max(jnp.abs(kconv)), 1e-8) / 127.0
        wq = jnp.clip(jnp.round(kconv / ws), -127, 127).astype(jnp.int8)
        dn = lax.conv_dimension_numbers(v.shape, kconv.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        acc = lax.conv_general_dilated(
            xq, wq, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (xs * ws)).astype(dt) + bconv.astype(dt)

    if "conv" in which:
        probe("conv3x3 64->64 bf16 (XLA)", conv_bf16, params, feat, K)
    if "convint8" in which:
        probe("conv3x3 64->64 int8 (XLA, dyn quant)", conv_int8,
              params, feat, K)

    ke = params["params"]["patch_embed_kernel"].astype(dt)
    be = params["params"]["patch_embed_bias"]
    if "embed" in which or "embedint8" in which:
        from transformerupscaler_tpu.ops.patch import patch_embed
        if "embed" in which:
            probe("patch_embed bf16", lambda pp, v: patch_embed(v, ke, be),
                  params, feat, K)
        if "embedint8" in which:
            from transformerupscaler_tpu.ops.quant import (int8_dense,
                                                           quantize_weight)

            def embed_int8(pp, v):
                b, h, w, c = v.shape
                t = v.reshape(b, h // 8, 8, w // 8, 8, c).transpose(
                    0, 1, 3, 2, 4, 5).reshape(b, h // 8, w // 8, 64 * c)
                kq, ks = quantize_weight(ke.reshape(64 * c, -1))
                return int8_dense(t, kq, ks, be)

            probe("patch_embed int8 (dyn act quant)", embed_int8,
                  params, feat, K)


if __name__ == "__main__":
    main()
