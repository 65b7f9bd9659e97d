#!/usr/bin/env python
"""Full-model int8_serve probes: dynamic vs static-calibrated scales vs the
bf16 packed baseline. Usage: python tools/int8_full_bench.py [K]"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def log(m):
    print(m, flush=True)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    which = set(sys.argv[2:]) or {"packed", "dyn", "static", "staticb4"}
    # "staticmlp": static full scope + int8 trunk MLPs (the only bf16 FLOPs
    # left in the static config are the trunk and the shuffle/resize).
    from transformerupscaler_tpu.registry import get_model

    dt = jnp.bfloat16
    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    base = get_model("FastTransformer", dtype=dt, compose_tails=True,
                     packed_serve=True)
    params = base.init(key, x, res_out=res_out)
    log(f"device: {jax.devices()[0]}")

    if "packed" in which:
        probe("full packed bf16 (baseline)",
              lambda pp, v: base.apply(pp, v, res_out=res_out),
              params, x, K, log=log)

    m_dyn = get_model("FastTransformer", dtype=dt, compose_tails=True,
                      int8_serve=True)
    if "dyn" in which:
        probe("full int8_serve dynamic",
              lambda pp, v: m_dyn.apply(pp, v, res_out=res_out),
              params, x, K, log=log)

    # Calibrate once (dynamic run with sown scales), then static.
    _, inter = jax.jit(
        lambda pp, v: m_dyn.apply(pp, v, res_out=res_out,
                                  mutable=["intermediates"])
    )(params, x)
    raw = inter["intermediates"]
    import numpy as np
    scales = tuple(
        tuple((np.asarray(raw[f"int8_scale_{n}"][0], np.float64)
               * 1.25).tolist())
        for n in ("feat1", "feat", "combined", "dec", "tokens"))
    log(f"calibrated scales: {scales}")
    m_st = get_model("FastTransformer", dtype=dt, compose_tails=True,
                     int8_serve=True, int8_scales=scales)
    if "static" in which:
        probe("full int8_serve static",
              lambda pp, v: m_st.apply(pp, v, res_out=res_out),
              params, x, K, log=log)
    if "staticmlp" in which:
        m_sm = get_model("FastTransformer", dtype=dt, compose_tails=True,
                         int8_serve=True, int8_scales=scales, int8_mlp=True)
        probe("full int8_serve static + int8_mlp",
              lambda pp, v: m_sm.apply(pp, v, res_out=res_out),
              params, x, K, log=log)
    if "staticb4" in which:
        xb = jax.random.uniform(key, (4, 720, 1280, 3), dt)
        per = probe("full int8_serve static batch=4",
                    lambda pp, v: m_st.apply(pp, v, res_out=res_out),
                    params, xb, K, log=log)
        log(f"{'':52s} -> {4 / per:8.2f} fps aggregate")


if __name__ == "__main__":
    main()
