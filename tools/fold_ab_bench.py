#!/usr/bin/env python
"""Same-process model-level A/B: folded vs factored branch-B tail per scale.

The op-level probe (tools/factored_tail_bench.py) says the factored tail
(dec2 macro-32 + 5x5 3->3r^2) beats the folded 7x7 64->3r^2 kernel by
1.1-2.3 ms at scales >=3. A cross-process model check at x3 measured the
opposite direction (12.53 vs 11.69 ms), which smells like chip-state
variance — this probes both routings in ONE process at the bench-matrix
serving config, with the timing passes INTERLEAVED (A,B,A,B), so slow
chip-state drift cannot masquerade as a routing difference.

TUX_FOLD_PRE is read at trace time, so flipping it between traces works;
each mode compiles once per scale.

Usage: python tools/fold_ab_bench.py [scales] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.probe_lib import chained_dyn


def main():
    scales = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                               else ["3", "4", "6"])]
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from transformerupscaler_tpu.registry import get_model

    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), jnp.bfloat16)
    m = get_model("FastTransformer", dtype=jnp.bfloat16, compose_tails=True,
                  packed_serve=True, pallas_serve=True, attn_impl="fused2")
    params = m.init(key, x, res_out=(1440, 2560))

    for scale in scales:
        res_out = (720 * scale, 1280 * scale)

        def apply(p, v):
            return m.apply(p, v, res_out=res_out)

        fns = {}
        for mode in ("folded", "factored"):
            os.environ["TUX_FOLD_PRE"] = "1" if mode == "folded" else "0"
            f = chained_dyn(apply)
            t0 = time.perf_counter()
            np.asarray(f(params, x, 1))
            print(f"x{scale} {mode}: compiled in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
            fns[mode] = f

        times = {m_: {1: [], K: []} for m_ in fns}
        for _ in range(4):  # interleaved passes
            for mode, f in fns.items():
                for mm in (1, K):
                    t1 = time.perf_counter()
                    np.asarray(f(params, x, mm))
                    times[mode][mm].append(time.perf_counter() - t1)
        for mode in fns:
            per = (min(times[mode][K]) - min(times[mode][1])) / (K - 1)
            print(f"x{scale} {mode:10s} {per * 1e3:8.3f} ms "
                  f"({1.0 / per:7.2f} fps)", flush=True)
    os.environ.pop("TUX_FOLD_PRE", None)


if __name__ == "__main__":
    main()
