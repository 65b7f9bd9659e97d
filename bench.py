#!/usr/bin/env python
"""Benchmark: FastTransformer 720p -> 1080p 2x upscaling, frames/sec/chip.

The BASELINE.json north star is >=120 fps sustained 720p->1080p 2x per TPU
v5e chip. Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Measurement method: this environment reaches the TPU through a tunneled PJRT
backend whose block_until_ready resolves optimistically, and whose RPC round
trip (~25 ms) would otherwise dominate. Each timing therefore runs M model
applications chained by a data dependency inside ONE jit and fetches a
scalar; differencing M=1 vs M=K cancels the round trip and measures pure
sustained device throughput (see tools/op_bench.py).
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
    from jax import lax

    from transformerupscaler_tpu.registry import get_model

    dev = jax.devices()[0]
    log(f"bench device: {dev}")

    res_out = (1080, 1920)
    # Serving fast path: composed branch tails on the all-XLA width-2-packed
    # pipeline (measured 14.2 ms vs 20.3 compose / 28.6 round-1 on v5e;
    # border-ring deviation documented in PERFORMANCE.md).
    model = get_model("FastTransformer", dtype=jnp.bfloat16,
                      compose_tails=True, packed_serve=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), jnp.bfloat16)

    t0 = time.perf_counter()
    params = model.init(key, x, res_out=res_out)

    def chained(m):
        # The feedback consumes the FULL output (sum) so XLA cannot shrink
        # the model to a single pixel's dependency cone.
        def fn(p, v):
            def body(_, carry):
                y = model.apply(p, carry, res_out=res_out)
                s = jnp.sum(y.astype(jnp.float32))
                return carry * (1.0 + 0.0 * s.astype(carry.dtype))
            return lax.fori_loop(0, m, body, v)[0, 0, 0, 0]
        return jax.jit(fn)

    K = 10
    f1, fk = chained(1), chained(K)
    _ = np.asarray(f1(params, x))
    _ = np.asarray(fk(params, x))
    log(f"compile: {time.perf_counter() - t0:.1f}s")

    def best(f, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _ = np.asarray(f(params, x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, tk = best(f1), best(fk)
    per_frame = (tk - t1) / (K - 1)
    fps = 1.0 / per_frame
    log(f"M=1 {t1*1e3:.1f} ms, M={K} {tk*1e3:.1f} ms "
        f"-> {per_frame*1e3:.2f} ms/frame, {fps:.2f} fps")

    print(json.dumps({
        "metric": "FastTransformer 720p->1080p 2x upscaling throughput",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 120.0, 3),
    }))


if __name__ == "__main__":
    main()
