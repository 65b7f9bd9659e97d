#!/usr/bin/env python
"""Re-measure the round-3 fused conv+tail rejection in the round-5 model.

The 10.24-vs-9.70 rejection (PERFORMANCE.md round 3) predates the split
branch-B tail, the deint-native conv1/decoder and the round-4/5 routing;
fusion economics may have shifted. Paired in-model A/B, interleaved
reps, one process: TUX_FUSE_STREAM=0 vs 1 on the shipped config.

Usage: python tools/fuse_recheck_bench.py [K] [reps]
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

    def run(name, fuse):
        os.environ["TUX_FUSE_STREAM"] = "1" if fuse else "0"
        m = get_model("FastTransformer", dtype=jnp.bfloat16,
                      compose_tails=True, pallas_serve=True,
                      attn_impl="fused2")
        per = probe(name, lambda p, v: m.apply(p, v, res_out=res_out),
                    params, x, K, log=print)
        print(f"    -> {1.0 / per:8.2f} fps", flush=True)

    for r in range(reps):
        run(f"[{r}] fuse off (shipped)", False)
        run(f"[{r}] fuse on (conv+tail kernels)", True)
    os.environ.pop("TUX_FUSE_STREAM", None)


if __name__ == "__main__":
    main()
