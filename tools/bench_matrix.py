#!/usr/bin/env python
"""Full benchmark matrix: all four model variants x scales {2,3,4,6}.

BASELINE.md's north star covers the whole matrix, not just the headline
FastTransformer 2x config. For each (variant, scale) this measures sustained
frames/sec/chip at a 720p input via the chained full-sum probe (the only
honest timing through the tunneled backend — see tools/op_bench.py), and
optionally the implementation-parity PSNR vs the PyTorch reference with
shared weights (CPU, small geometry) via tools/parity_check machinery.

Usage:
    python tools/bench_matrix.py [--models A,B] [--scales 2,3] [--k 6]
        [--serve xla|fast] [--json out.json]

``--serve fast`` enables the serving fast path (compose_tails + the
all-XLA packed pipeline, FastTransformer only); ``xla`` is the exact
reference path.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

MODELS = ["BicubicInterpolation", "ResidualTransformer", "WindowTransformer",
          "FastTransformer"]
SCALES = [2, 3, 4, 6]


from tools.probe_lib import probe  # noqa: E402 — one compile per config


def bench_one(model_name, scale, serve, K):
    from transformerupscaler_tpu.registry import get_model

    dt = jnp.bfloat16
    kw = {}
    if serve == "fast":
        kw = dict(compose_tails=True, packed_serve=True)
    model = get_model(model_name, dtype=dt, **kw)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    init_kw = {"res_out": (720 * scale, 1280 * scale)}
    params = get_model(model_name, dtype=dt).init(key, x, **init_kw)

    def apply(p, v):
        if model_name == "BicubicInterpolation":
            return model.apply(p, v, res_out=(720 * scale, 1280 * scale))
        return model.apply(p, v, upscale_factor=scale)

    per = probe(f"{model_name} x{scale}", apply, params, x, K, log=None)
    return 1.0 / per, per * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=str, default=",".join(MODELS))
    ap.add_argument("--scales", type=str, default="2,3,4,6")
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--serve", choices=["xla", "fast"], default="fast")
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import transformerupscaler_tpu  # noqa: F401 — applies the TUX_PLATFORM hook
    print(f"device: {jax.devices()[0]}  serve={args.serve}", flush=True)
    rows = []
    for model_name in args.models.split(","):
        for scale in (int(s) for s in args.scales.split(",")):
            try:
                fps, ms = bench_one(model_name, scale, args.serve, args.k)
                rows.append({"model": model_name, "scale": scale,
                             "fps_per_chip": round(fps, 2),
                             "ms_per_frame": round(ms, 3)})
                print(f"{model_name:24s} x{scale}  {ms:8.2f} ms  "
                      f"{fps:8.2f} fps", flush=True)
            except Exception as e:  # noqa: BLE001 — report and continue
                rows.append({"model": model_name, "scale": scale,
                             "error": str(e)[:200]})
                print(f"{model_name:24s} x{scale}  ERROR {e}", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"written: {args.json}")


if __name__ == "__main__":
    main()
