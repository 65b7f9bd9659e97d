#!/usr/bin/env python
"""Paired in-model A/B of Mosaic scheduling levers on the deint convs.

The conv2/decoder kernels run at ~2x their HBM+MXU bound with the gap
attributed to DMA/compute overlap (PERFORMANCE.md "conv2-vs-decoder
asymmetry"). Two untried compiler levers, env-gated in
conv3x3_deint_stream:

  dimsem   dimension_semantics=("parallel","parallel") — every row-slab
           is independent; lets Mosaic reorder/overlap grid steps.
  infuse   allow_input_fusion — XLA may fuse producers into operands
           (attacks the XLA->Pallas seam after conv1).

Usage: python tools/sched_levers_ab.py [K] [reps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from transformerupscaler_tpu.registry import get_model

    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), jnp.bfloat16)
    params = get_model("FastTransformer", dtype=jnp.bfloat16,
                       compose_tails=True).init(key, x, res_out=res_out)
    print(f"device: {jax.devices()[0]}", flush=True)

    def run(name, env):
        for k in ("TUX_DIMSEM", "TUX_INPUT_FUSION"):
            os.environ.pop(k, None)
        os.environ.update(env)
        m = get_model("FastTransformer", dtype=jnp.bfloat16,
                      compose_tails=True, pallas_serve=True,
                      attn_impl="fused2")
        per = probe(name, lambda p, v: m.apply(p, v, res_out=res_out),
                    params, x, K, log=print)
        print(f"    -> {1.0 / per:8.2f} fps", flush=True)

    for r in range(reps):
        run(f"[{r}] base", {})
        run(f"[{r}] dimsem", {"TUX_DIMSEM": "1"})
        run(f"[{r}] infuse", {"TUX_INPUT_FUSION": "1"})
        run(f"[{r}] both", {"TUX_DIMSEM": "1", "TUX_INPUT_FUSION": "1"})
    for k in ("TUX_DIMSEM", "TUX_INPUT_FUSION"):
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
