#!/usr/bin/env python
"""In-model cost of the split-B-tail finish hi/lo modes at the headline.

One process, one params init: probes the headline config (bf16 pallas +
paired fused2) with TUX_SPLIT_TAIL=1 under hi_lo_fin off / wf / full
(TUX_HILO_FIN is read at trace time, so flipping os.environ between
probes retraces cleanly), plus the composed fold as the control. Written
because the r4 split sweep measured 8.29 ms where the pre-wf split
measured 7.62 — this pins which mode pays what.

Usage: python tools/hilo_bench.py [K] [scale]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from transformerupscaler_tpu.registry import get_model

    res_out = (720 * scale // 2 * 2, 1280 * scale // 2 * 2) \
        if scale != 2 else (1080, 1920)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), jnp.bfloat16)
    m = get_model("FastTransformer", dtype=jnp.bfloat16,
                  compose_tails=True, pallas_serve=True, attn_impl="fused2")
    params = m.init(key, x, res_out=res_out)
    print(f"device: {jax.devices()[0]}  res_out={res_out}", flush=True)

    def run(name):
        per = probe(name, lambda p, v: m.apply(p, v, res_out=res_out),
                    params, x, K, log=print)
        print(f"    -> {1.0 / per:8.2f} fps", flush=True)

    # Force the composed fold explicitly: the split tail is now the
    # measured AUTO default on the fast path (fast_transformer.split_tail).
    os.environ["TUX_SPLIT_TAIL"] = "0"
    try:
        run("composed fold (control)")
        os.environ["TUX_SPLIT_TAIL"] = "1"
        for mode in ("off", "wf", "full"):
            os.environ["TUX_HILO_FIN"] = mode
            run(f"split + hi_lo_fin={mode}")
    finally:
        # A leftover TUX_HILO_FIN/TUX_SPLIT_TAIL would silently override
        # explicit config in any later run sharing this environment.
        os.environ.pop("TUX_HILO_FIN", None)
        os.environ.pop("TUX_SPLIT_TAIL", None)


if __name__ == "__main__":
    main()
