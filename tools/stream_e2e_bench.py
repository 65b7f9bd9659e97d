#!/usr/bin/env python
"""End-to-end StreamPipeline throughput on the real TPU (VERDICT r2 item 4).

Drives the PRODUCT streaming path — uint8 H2D, two frames in flight,
device compute, uint8 D2H — with a synthetic 720p source, and reports
sustained fps plus the stage report, next to bench.py's pure-device number.

Through the tunneled backend the D2H fetch pays the RPC round trip per
frame; the stage report attributes it (the 'postprocess' stage is the
blocked, non-overlapped part of the fetch).

Usage: python tools/stream_e2e_bench.py [frames] [config]
  config: bf16 (default) | pallas | int8
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    config = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    import jax.numpy as jnp

    from transformerupscaler_tpu.stream_lib import StreamPipeline

    kw = dict(compose_tails=True)
    if config == "pallas":
        # The full headline serving config (bench.py): Pallas stream
        # kernels + the fused2 paired trunk megakernel.
        kw["pallas_serve"] = True
        kw["attn_impl"] = "fused2"
    elif config == "int8":
        kw["pallas_serve"] = True
        kw["attn_impl"] = "fused2"
        kw["int8_serve"] = True
    pipe = StreamPipeline("FastTransformer", (720, 1280), (1080, 1920),
                          dtype=jnp.bfloat16, **kw)
    print(f"config={config} checkpoint={pipe.from_checkpoint}", flush=True)
    t = pipe.warmup()
    print(f"warmup (compile): {t:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    # 8 distinct frames cycled: content irrelevant to timing, but distinct
    # buffers keep the H2D path honest.
    pool = [rng.integers(0, 256, (720, 1280, 3), dtype=np.uint8)
            for _ in range(8)]

    def source():
        for i in range(frames):
            yield pool[i % len(pool)]

    t0 = time.perf_counter()
    stats = pipe.run(source(), sink=None)
    wall = time.perf_counter() - t0
    print(f"frames={stats['frames']} wall={wall:.2f}s "
          f"fps={stats['fps']:.2f}")
    print(stats["report"])


if __name__ == "__main__":
    main()
