#!/usr/bin/env python
"""Frozen-weights serving: params as compile-time constants vs traced args.

The r4 stage budget measured a 0.38 ms gap between the hand-built probe
chain (weight prep hoisted into Python closure constants: composed tail
folding, macro-8 packing, dtype casts) and the real `model.apply`
(8.05 vs 8.43 ms). With params as a *traced* jit argument the prep
re-executes on-device every frame; closing the params over the jit
boundary makes them XLA constants, so the folds constant-fold at compile
time — the production-correct shape for serving frozen weights.

Probes the headline and quality configs both ways in one process.

Usage: python tools/frozen_bench.py [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from transformerupscaler_tpu.registry import get_model

    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}", flush=True)
    dummy = jnp.zeros(())

    for name, quality in (("headline bf16", False), ("quality", True)):
        x_dt = jnp.float32 if quality else jnp.bfloat16
        x = jax.random.uniform(key, (1, 720, 1280, 3), x_dt)
        m = get_model("FastTransformer", dtype=jnp.bfloat16,
                      compose_tails=True, pallas_serve=True,
                      attn_impl="fused2", serve_quality=quality)
        t0 = time.perf_counter()
        params = m.init(key, x, res_out=res_out)
        print(f"[{name}] init {time.perf_counter() - t0:.0f}s", flush=True)

        per_t = probe(f"{name}: params traced",
                      lambda p, v: m.apply(p, v, res_out=res_out),
                      params, x, K, log=print)
        per_f = probe(f"{name}: params frozen (const)",
                      lambda p, v: m.apply(params, v, res_out=res_out),
                      dummy, x, K, log=print)
        print(f"    traced {1/per_t:7.2f} fps   frozen {1/per_f:7.2f} fps   "
              f"delta {(per_t - per_f)*1e3:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
