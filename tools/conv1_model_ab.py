#!/usr/bin/env python
"""Paired in-model A/B of the streaming conv1 at the headline geometry.

Session-to-session op-level numbers for this stage swing ~50%
(tools/conv1_sweep.py: ship 0.621 vs 0.925 across two sessions), so the
decision metric is the full serving forward, one process, back to back:

  off        conv1_stream=False (the shipping XLA dots conv1)
  s16 / s48  conv1_stream=True at TUX_CONV1_ROWS 16 / 48

Usage: python tools/conv1_model_ab.py [K] [reps]
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

    def run(name, flag, rows=None):
        if rows is None:
            os.environ.pop("TUX_CONV1_ROWS", None)
        else:
            os.environ["TUX_CONV1_ROWS"] = str(rows)
        m = get_model("FastTransformer", dtype=jnp.bfloat16,
                      compose_tails=True, pallas_serve=True,
                      attn_impl="fused2", conv1_stream=flag)
        per = probe(name, lambda p, v: m.apply(p, v, res_out=res_out),
                    params, x, K, log=print)
        print(f"    -> {1.0 / per:8.2f} fps", flush=True)

    # Interleave reps to cancel slow drift within the session.
    for r in range(reps):
        run(f"[{r}] conv1 off (XLA dots)", False)
        run(f"[{r}] conv1 stream rows=16", True, 16)
        run(f"[{r}] conv1 stream rows=48", True, 48)
    os.environ.pop("TUX_CONV1_ROWS", None)


if __name__ == "__main__":
    main()
