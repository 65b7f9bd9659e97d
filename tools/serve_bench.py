#!/usr/bin/env python
"""Full-model serving-config A/B bench (chained full-sum probes).

Isolates each round-2 transform's in-context effect at the headline
geometry. Env kill-switches TUX_CONV_MACRO / TUX_CONV_PACKED control the
conv routings (read at trace time, so set per-process).

Usage: serve_bench.py [K] [probe names...]
Probes: exact compose pallas trunkfused embed unembed
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
    f1, fK = chained(apply_fn, 1), chained(apply_fn, K)
    _ = np.asarray(f1(params, x))
    _ = np.asarray(fK(params, x))
    t1, tK = timed(f1, params, x), timed(fK, params, x)
    per = (tK - t1) / (K - 1)
    print(f"{name:52s} {per * 1e3:8.3f} ms", flush=True)
    return per


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    which = set(sys.argv[2:]) or {"exact", "compose", "pallas", "embed",
                                  "unembed"}
    from transformerupscaler_tpu.registry import get_model

    dt = jnp.bfloat16
    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    base = get_model("FastTransformer", dtype=dt)
    params = base.init(key, x, res_out=res_out)
    print(f"device: {jax.devices()[0]} "
          f"macro={os.environ.get('TUX_CONV_MACRO', '1')} "
          f"packed={os.environ.get('TUX_CONV_PACKED', '1')}", flush=True)

    def full(model):
        return lambda pp, v: model.apply(pp, v, res_out=res_out)

    if "exact" in which:
        probe("full model exact (no compose)", full(base), params, x, K)
    if "compose" in which:
        m = get_model("FastTransformer", dtype=dt, compose_tails=True)
        probe("full model compose_tails", full(m), params, x, K)
    if "pallas" in which:
        m = get_model("FastTransformer", dtype=dt, compose_tails=True,
                      pallas_serve=True)
        probe("full model compose + pallas embed/unembed", full(m),
              params, x, K)
    for name in which:
        # batchN  -> compose path at batch N;  pbatchN -> pallas path.
        if name.startswith("batch") or name.startswith("pbatch"):
            pall = name.startswith("pbatch")
            nb = int(name[6:] if pall else name[5:])
            xb = jax.random.uniform(key, (nb, 720, 1280, 3), dt)
            m = get_model("FastTransformer", dtype=dt, compose_tails=True,
                          pallas_serve=pall)

            def apply_b(pp, v, m=m):
                return m.apply(pp, v, res_out=res_out)

            f1, fK = chained(apply_b, 1), chained(apply_b, K)
            _ = np.asarray(f1(params, xb))
            _ = np.asarray(fK(params, xb))
            t1, tK = timed(f1, params, xb), timed(fK, params, xb)
            per = (tK - t1) / (K - 1)
            label = ("pallas" if pall else "compose") + f" batch={nb}"
            print(f"{'full model ' + label:52s} {per * 1e3:8.3f} ms  "
                  f"{nb / per:8.2f} fps aggregate", flush=True)
    if "trunkfused" in which:
        m = get_model("FastTransformer", dtype=dt, compose_tails=True,
                      pallas_serve=True, attn_impl="fused")
        probe("full model compose + pallas + fused trunk", full(m),
              params, x, K)

    feat = jax.random.uniform(key, (1, 720, 1280, 64), dt)
    tokens = jax.random.uniform(key, (1, 90, 160, 192), dt)
    ke = params["params"]["patch_embed_kernel"].astype(dt)
    be = params["params"]["patch_embed_bias"]
    ku = params["params"]["patch_unembed_kernel"].astype(dt)
    bu = params["params"]["patch_unembed_bias"]
    if "embed" in which:
        from transformerupscaler_tpu.ops.patch import patch_embed
        from transformerupscaler_tpu.ops.pallas.patch_kernels import (
            fused_patch_embed,
        )
        probe("patch_embed XLA", lambda pp, v: patch_embed(v, ke, be),
              params, feat, K)
        probe("patch_embed pallas",
              lambda pp, v: fused_patch_embed(v, ke, be), params, feat, K)
    if "unembed" in which:
        from transformerupscaler_tpu.ops.patch import patch_unembed
        from transformerupscaler_tpu.ops.pallas.patch_kernels import (
            fused_patch_unembed_add,
        )
        feat0 = feat

        def un_xla(pp, v):
            return patch_unembed(v, ku, bu) + feat0

        def un_pl(pp, v):
            return fused_patch_unembed_add(v, feat0, ku, bu)

        probe("patch_unembed + add XLA", un_xla, params, tokens, K)
        probe("patch_unembed + add pallas", un_pl, params, tokens, K)


if __name__ == "__main__":
    main()
