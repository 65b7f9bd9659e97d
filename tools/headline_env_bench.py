#!/usr/bin/env python
"""Headline-config in-model A/B over TUX_* env flags, one process.

Probes the full bench.py serving config (compose_tails + pallas_serve +
fused2 trunk, bf16, 720p -> 1080p) once per env setting — env flags are
read at trace time, and each probe() traces fresh, so flipping them
between probes is a clean same-process paired comparison.

Usage: python tools/headline_env_bench.py [K] "FLAG=V[,FLAG2=V2]" ...
An empty string spec means the shipped defaults.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    specs = sys.argv[2:] or ["", "TUX_TAIL_ROWS=16"]
    from transformerupscaler_tpu.registry import get_model

    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), jnp.bfloat16)
    m = get_model("FastTransformer", dtype=jnp.bfloat16, compose_tails=True,
                  pallas_serve=True, attn_impl="fused2")
    params = get_model("FastTransformer", dtype=jnp.bfloat16,
                       compose_tails=True).init(key, x, res_out=res_out)
    print(f"device: {jax.devices()[0]}", flush=True)

    baseline_env = dict(os.environ)
    for spec in specs:
        os.environ.clear()
        os.environ.update(baseline_env)
        for kv in filter(None, spec.split(",")):
            k, _, v = kv.partition("=")
            os.environ[k] = v
        per = probe(spec or "defaults",
                    lambda p, v: m.apply(p, v, res_out=res_out),
                    params, x, K, log=None)
        print(f"{spec or 'defaults':40s} {per*1e3:8.3f} ms "
              f"{1.0/per:8.2f} fps", flush=True)


if __name__ == "__main__":
    main()
