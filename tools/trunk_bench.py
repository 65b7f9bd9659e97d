#!/usr/bin/env python
"""Device probe: XLA per-block trunk vs the fused Pallas trunk megakernel,
at the FastTransformer 720p serving geometry (240 windows x 64 tokens x 192).

Chained full-sum probes (see tools/op_bench.py). Usage: trunk_bench.py [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


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


def probe(name, apply_fn, params, x, K=8):
    f1, fK = chained(apply_fn, 1), chained(apply_fn, K)
    _ = np.asarray(f1(params, x))
    _ = np.asarray(fK(params, x))
    t1, tK = timed(f1, params, x), timed(fK, params, x)
    per = (tK - t1) / (K - 1)
    print(f"{name:46s} {per * 1e3:8.3f} ms", flush=True)
    return per


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from transformerupscaler_tpu.registry import get_model
    from transformerupscaler_tpu.models.common import run_window_trunk

    dt = jnp.bfloat16
    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    tokens = jax.random.uniform(key, (1, 90, 160, 192), dt)
    print(f"device: {jax.devices()[0]}", flush=True)

    m_x = get_model("FastTransformer", dtype=dt, compose_tails=True,
                    attn_impl="xla")
    m_f = get_model("FastTransformer", dtype=dt, compose_tails=True,
                    attn_impl="fused")
    m_p = get_model("FastTransformer", dtype=dt, compose_tails=True,
                    attn_impl="fused", pallas_serve=True)
    params = m_x.init(key, x, res_out=res_out)

    bx = m_x.bind(params)
    bf = m_f.bind(params)

    # numerics on-device first
    y_x = jax.jit(lambda p, v: m_x.apply(p, v, res_out=res_out))(params, x)
    y_f = jax.jit(lambda p, v: m_f.apply(p, v, res_out=res_out))(params, x)
    d = float(jnp.max(jnp.abs(y_x.astype(jnp.float32) -
                              y_f.astype(jnp.float32))))
    print(f"full-model fused-vs-xla maxdiff: {d:.6f}", flush=True)

    probe("trunk XLA per-block",
          lambda pp, v: run_window_trunk(v, bx.blocks, 8), params, tokens, K)
    probe("trunk FUSED pallas megakernel",
          lambda pp, v: run_window_trunk(v, bf.blocks, 8), params, tokens, K)
    probe("full model attn_impl=xla",
          lambda pp, v: m_x.apply(pp, v, res_out=res_out), params, x, K)
    probe("full model attn_impl=fused",
          lambda pp, v: m_f.apply(pp, v, res_out=res_out), params, x, K)

    y_p = jax.jit(lambda p, v: m_p.apply(p, v, res_out=res_out))(params, x)
    d = float(jnp.max(jnp.abs(y_x.astype(jnp.float32) -
                              y_p.astype(jnp.float32))))
    print(f"full-model pallas_serve maxdiff: {d:.6f}", flush=True)
    probe("full model fused + pallas embed/unembed",
          lambda pp, v: m_p.apply(pp, v, res_out=res_out), params, x, K)


if __name__ == "__main__":
    main()
