#!/usr/bin/env python
"""Paired in-model A/B of conv3x3_deint_stream slab height (TUX_CONV_ROWS).

The warm-context sweep (tools/conv2_seam_bench.py) measured the second
of two chained deint convs at 0.714 ms with rows=8 vs 0.908 at the
shipped rows=16 (48: 1.276). This decides it in the full serving
forward (conv2 + decoder conv both route through conv3x3_deint_stream),
one process, interleaved reps.

Usage: python tools/conv_rows_model_ab.py [K] [reps]
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

    def run(name, rows):
        if rows is None:
            os.environ.pop("TUX_CONV_ROWS", None)
        else:
            os.environ["TUX_CONV_ROWS"] = str(rows)
        m = get_model("FastTransformer", dtype=jnp.bfloat16,
                      compose_tails=True, pallas_serve=True,
                      attn_impl="fused2")
        per = probe(name, lambda p, v: m.apply(p, v, res_out=res_out),
                    params, x, K, log=print)
        print(f"    -> {1.0 / per:8.2f} fps", flush=True)

    for r in range(reps):
        run(f"[{r}] conv rows=16 (shipped)", None)
        run(f"[{r}] conv rows=8", 8)
    os.environ.pop("TUX_CONV_ROWS", None)


if __name__ == "__main__":
    main()
