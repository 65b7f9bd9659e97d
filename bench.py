#!/usr/bin/env python
"""Benchmark: FastTransformer 720p -> 1080p 2x upscaling, frames/sec/chip.

The BASELINE.json north star is >=120 fps sustained 720p->1080p 2x per TPU
v5e chip. Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from transformerupscaler_tpu.infer_lib import UpscalerEngine

    dev = jax.devices()[0]
    log(f"bench device: {dev}")

    engine = UpscalerEngine("FastTransformer", dtype=jnp.bfloat16, donate=False)
    res_out = (1080, 1920)
    in_hw = (720, 1280)

    t_compile = engine.warmup(in_hw, res_out=res_out)
    log(f"compile: {t_compile:.1f}s")

    rng = np.random.default_rng(0)
    frames = [rng.random((*in_hw, 3), dtype=np.float32).astype(np.float32)
              for _ in range(4)]

    # steady-state warmup
    for f in frames[:2]:
        jax.block_until_ready(engine.upscale(f, res_out=res_out, device_out=True))

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        out = engine.upscale(frames[i % len(frames)], res_out=res_out,
                             device_out=True)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = iters / dt
    log(f"{iters} frames in {dt:.3f}s -> {fps:.2f} fps")

    print(json.dumps({
        "metric": "FastTransformer 720p->1080p 2x upscaling throughput",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 120.0, 3),
    }))


if __name__ == "__main__":
    main()
