#!/usr/bin/env python
"""Joint north-star sweep: headline vs quality composed, banded on/off.

One process, one params init, chained abs-sum probes (tools/probe_lib).
Measures the configs that bracket the r3 verdict's joint target
(>=120 fps AND <=0.05 dB GT delta):

  headline            bf16 pallas + paired fused2, compose_tails (control)
  quality composed    + serve_quality (f32 tails; banded squash auto-on)
  quality banded=0    same, dense squash (the pre-banded quality config)

TUX_BANDED_RESIZE is read at trace time; flipping os.environ between
probes retraces cleanly (same pattern as tools/hilo_bench.py).

Usage: python tools/joint_bench.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from transformerupscaler_tpu.registry import get_model

    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    xb = jax.random.uniform(key, (1, 720, 1280, 3), jnp.bfloat16)
    xf = xb.astype(jnp.float32)
    print(f"device: {jax.devices()[0]}", flush=True)

    mh = get_model("FastTransformer", dtype=jnp.bfloat16,
                   compose_tails=True, pallas_serve=True,
                   attn_impl="fused2")
    ph = mh.init(key, xb, res_out=res_out)
    mq = get_model("FastTransformer", dtype=jnp.bfloat16,
                   compose_tails=True, pallas_serve=True,
                   attn_impl="fused2", serve_quality=True)

    def run(name, m, x):
        per = probe(name, lambda pp, v, mm=m: mm.apply(pp, v,
                                                       res_out=res_out),
                    ph, x, K, log=print)
        print(f"    -> {1.0 / per:8.2f} fps", flush=True)

    os.environ.pop("TUX_BANDED_RESIZE", None)
    run("headline (banded auto=dense)", mh, xb)
    run("quality composed (banded auto=on)", mq, xf)
    os.environ["TUX_BANDED_RESIZE"] = "0"
    run("quality composed banded=0", mq, xf)
    os.environ.pop("TUX_BANDED_RESIZE", None)
    # Re-run the pair to bound same-process drift.
    run("headline (repeat)", mh, xb)
    run("quality composed (repeat)", mq, xf)


if __name__ == "__main__":
    main()
