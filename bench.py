#!/usr/bin/env python
"""Benchmark: FastTransformer 720p -> 1080p 2x upscaling, frames/sec/chip.

The BASELINE.json north star is >=120 fps sustained 720p->1080p 2x per TPU
v5e chip. Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Serving config (PERFORMANCE.md): compose_tails on the width-2-packed
pipeline with the Pallas stream kernels (ops/pallas/stream.py: dots conv1,
row-streamed conv, macro-8 tails, patch embed/unembed GEMM kernels) and
the fused2 trunk megakernel (ops/pallas/trunk2.py), pure bf16.
Quality: implementation parity is 144-160 dB vs the PyTorch reference at
f32 on the exact path; this serving config runs at ~55 dB fidelity to that
path, whose measured ground-truth cost equals the statistical noise floor
of that fidelity — +0.03..+0.11 dB mean depending on the frame set,
interior ~0 on the attribution set (tools/headline_quality.py; the floor
law and per-config numbers are in PERFORMANCE.md's quality-gate section).
TUX_F32_TAIL=1 raises fidelity to ~57 dB for ~0.1 ms.
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
    config = os.environ.get("TUX_BENCH_CONFIG", "quality")
    key = jax.random.PRNGKey(0)
    # Default "quality" = serve_quality mode (quality_parts default
    # "tails"): the branch tails emit f32 so the add/squash/clip never
    # round the image through bf16 — the joint-north-star config
    # (>=120 fps at <=0.05 dB, BASELINE.md; GT delta measured on the
    # FULL 34-frame held-out gate, PERFORMANCE.md round-5 section).
    # TUX_BENCH_CONFIG=bf16 opts back into the pure-bf16 fast config
    # (~1 fps faster, quality bar not met). HIGH/HIGHEST squash and the
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
