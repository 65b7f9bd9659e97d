#!/usr/bin/env python
"""Batched-throughput serving probe at the headline geometry (one process).

The headline bench is batch-1 (mirrors /root/reference/speed_test.py's
sequential per-image loop, speed_test.py:60-75). Production throughput
serving can batch frames; batch-B raises MXU occupancy on the GEMM-bound
stages (trunk 18.7% MFU at B=1, stage budget). This records per-frame
cost vs B on the shipped serving config.

Usage: python tools/batch_bench.py [K] [batches...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batches = [int(a) for a in sys.argv[2:]] or [1, 2, 4]
    from transformerupscaler_tpu.registry import get_model

    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    m = get_model("FastTransformer", dtype=jnp.bfloat16, compose_tails=True,
                  pallas_serve=True, attn_impl="fused2")
    x1 = jax.random.uniform(key, (1, 720, 1280, 3), jnp.bfloat16)
    params = m.init(key, x1, res_out=res_out)
    print(f"device: {jax.devices()[0]}", flush=True)

    for b in batches:
        x = jax.random.uniform(key, (b, 720, 1280, 3), jnp.bfloat16)
        per = probe(f"batch={b}", lambda p, v: m.apply(p, v, res_out=res_out),
                    params, x, K, log=print)
        print(f"    -> {per / b * 1e3:8.3f} ms/frame, "
              f"{b / per:8.2f} frames/sec/chip", flush=True)


if __name__ == "__main__":
    main()
