#!/usr/bin/env python
"""Benchmark: FastTransformer 720p -> 1080p 2x upscaling, frames/sec/chip.

The BASELINE.json north star is >=120 fps sustained 720p->1080p 2x per TPU
v5e chip. Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Serving config (PERFORMANCE.md): compose_tails on the width-2-packed
pipeline with the Pallas stream kernels (ops/pallas/stream.py: dots conv1,
row-streamed conv, macro-8 tails, the split branch-B tail
tail_finish_stream — the round-5 measured auto default, patch
embed/unembed GEMM kernels) and the fused2 trunk megakernel
(ops/pallas/trunk2.py), pure bf16.
Quality: implementation parity is 144-160 dB vs the PyTorch reference at
f32 on the exact path; this serving config runs at ~57 dB fidelity to
that path, and its measured ground-truth cost on the FULL 34-frame
held-out gate is +0.0047 dB mean (interior -0.0040; round-5 capture,
tools/headline_quality.py --images 34) — INSIDE the <=0.05 dB north-star
bar, so this default is the joint >=120 fps + <=0.05 dB config.
TUX_BENCH_CONFIG=quality opts into serve_quality (f32 image boundaries:
34-frame mean -0.0223 dB with per-frame max +0.0146 — the stricter
worst-frame bound — at 120.5-121.2 fps, two protocol captures:
BOTH shipped quality configs meet the joint north star).
Set TUX_BENCH_CONFIG=int8_residual for the int8
residual-scope mode (+0.07 dB GT PSNR delta, tools/int8_quality.py) or
int8_full (full-scope static int8, mean GT delta -0.02 dB); calibration
(dynamic-quant frames) happens at setup like compilation and is excluded
from steady-state timing.

Measurement method: this environment reaches the TPU through a tunneled PJRT
backend whose block_until_ready resolves optimistically, and whose RPC round
trip (~25 ms) would otherwise dominate. Each timing runs M model
applications chained by a full abs-sum data dependency inside ONE jit
(M traced -> one compile) and fetches a scalar; differencing M=1 vs M=K
cancels the round trip and measures pure sustained device throughput
(tools/probe_lib.py).
"""

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.probe_lib import chained_dyn
    from transformerupscaler_tpu.registry import get_model

    dev = jax.devices()[0]
    log(f"bench device: {dev}")

    res_out = (1080, 1920)
    config = os.environ.get("TUX_BENCH_CONFIG", "bf16")
    key = jax.random.PRNGKey(0)
    # Default "bf16" IS the joint-north-star config as of round 5: the
    # full 34-frame held-out gate measures its GT delta at +0.0047 dB
    # mean (<=0.05 bar, PERFORMANCE.md round-5 section) and the driver
    # protocol measures 128.66 fps (split branch-B tail auto default).
    # "quality" = serve_quality (f32 image boundaries): mean -0.0223 dB
    # with per-frame MAX +0.0146 — the belt-and-suspenders config for
    # worst-frame bounds — at 120.5-121.2 fps. HIGH/HIGHEST squash and the
    # exact-uint8 conv1 are opt-in parts; both measured unnecessary or
    # harmful on the bf16-trained ep-100 checkpoint
    # (models/fast_transformer.py quality_parts docstring).
    x_dt = jnp.float32 if config == "quality" else jnp.bfloat16
    x = jax.random.uniform(key, (1, 720, 1280, 3), x_dt)

    t0 = time.perf_counter()
    base = get_model("FastTransformer", dtype=jnp.bfloat16,
                     compose_tails=True, pallas_serve=True,
                     attn_impl="fused2",
                     serve_quality=(config == "quality"))
    params = base.init(key, x, res_out=res_out)

    int8_trunk = config.endswith("_trunk")
    if int8_trunk:
        config = config[:-len("_trunk")]
    if config in ("int8_residual", "int8_full", "int8_tails"):
        scope = config.split("_", 1)[1]
        # The "tails" scope lives inside the Pallas pipeline; its dynamic
        # calibration pass must run the same pipeline so the sown feat/dec
        # scales measure exactly the tensors the int8 tail kernels will
        # consume. residual/full calibrate through the all-XLA int8 path.
        tails = scope == "tails"
        m_dyn = get_model("FastTransformer", dtype=jnp.bfloat16,
                          compose_tails=True, int8_serve=True,
                          int8_scope=scope, pallas_serve=tails,
                          attn_impl="fused2" if tails else "xla")
        _, inter = jax.jit(
            lambda pp, v: m_dyn.apply(pp, v, res_out=res_out,
                                      mutable=["intermediates"]))(params, x)
        raw = inter["intermediates"]

        def grab(n):
            if f"int8_scale_{n}" not in raw:
                return (1.0,)
            return tuple((np.asarray(raw[f"int8_scale_{n}"][0], np.float64)
                          * 1.1).tolist())

        scales = tuple(grab(n)
                       for n in ("feat1", "feat", "combined", "dec", "tokens"))
        model = get_model("FastTransformer", dtype=jnp.bfloat16,
                          compose_tails=True, int8_serve=True,
                          int8_scope=scope, int8_scales=scales,
                          pallas_serve=tails, int8_trunk=int8_trunk,
                          attn_impl="fused2" if (tails or int8_trunk)
                          else "xla")
    elif int8_trunk:
        # "bf16_trunk": the bf16 pallas pipeline + rowwise int8 trunk.
        model = get_model("FastTransformer", dtype=jnp.bfloat16,
                          compose_tails=True, pallas_serve=True,
                          int8_trunk=True, attn_impl="fused2")
    else:
        model = base

    f = chained_dyn(lambda p, v: model.apply(p, v, res_out=res_out))
    _ = np.asarray(f(params, x, 1))
    log(f"setup (compile + calibration): {time.perf_counter() - t0:.1f}s")

    # M is a traced argument (tools/probe_lib.chained_dyn), so a longer
    # chain costs zero extra compiles; K=24 cuts the differencing noise
    # ~2.5x vs the round-2 K=10 (the tunnel's per-fetch jitter divides by
    # K-1), making the reported number track the true device rate.
    K = 24

    def best(m, n=6):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _ = np.asarray(f(params, x, m))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, tk = best(1), best(K)
    per_frame = (tk - t1) / (K - 1)
    fps = 1.0 / per_frame
    log(f"M=1 {t1*1e3:.1f} ms, M={K} {tk*1e3:.1f} ms "
        f"-> {per_frame*1e3:.2f} ms/frame, {fps:.2f} fps "
        f"[{config}{'+trunk' if int8_trunk else ''}]")

    print(json.dumps({
        "metric": "FastTransformer 720p->1080p 2x upscaling throughput",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 120.0, 3),
    }))


if __name__ == "__main__":
    main()
