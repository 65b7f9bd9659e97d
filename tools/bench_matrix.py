#!/usr/bin/env python
"""Full benchmark matrix: all four model variants x scales {2,3,4,6}.

BASELINE.md's north star covers the whole matrix, not just the headline
FastTransformer 2x config. For each (variant, scale) this measures sustained
frames/sec/chip at a 720p input via the chained abs-sum probe (the only
honest timing through the tunneled backend — see tools/probe_lib.py), plus a
serving-quality column: PSNR of the served configuration (bf16 + serve-path
transforms) against the exact f32 path with the same weights, computed on
CPU at a small geometry. Implementation parity vs the PyTorch reference is
established separately (tools/parity_check.py, 144-160 dB at f32); this
column isolates what the SERVING config adds on top.

Sub-millisecond configs (Bicubic) sit near the probe's resolution: the probe
difference tK - t1 at small K is noise-dominated there, so K escalates
automatically (M is a traced argument — no recompile) and rows still under
the floor report {"floor": true} with the best estimate instead of a
nonsense value.

Usage:
    python tools/bench_matrix.py [--models A,B] [--scales 2,3] [--k 6]
        [--serve xla|fast] [--no_quality] [--json out.json]

``--serve fast`` enables the serving fast path (compose_tails + the
all-XLA packed pipeline where the variant supports it); ``xla`` is the
exact reference path.
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
# pallas_serve implies the packed pipeline for FastTransformer; models
# without the field (Bicubic/Window/Residual) ignore unknown overrides.
SERVE_KW = dict(compose_tails=True, packed_serve=True, pallas_serve=True,
                attn_impl="fused2")

# Below this per-frame time the probe difference is noise-dominated at
# small K; escalate K, and flag the row as a floor estimate if still under.
FLOOR_S = 1.5e-3


from tools.probe_lib import probe  # noqa: E402 — one compile per config


def bench_one(model_name, scale, serve, K):
    from transformerupscaler_tpu.registry import get_model

    dt = jnp.bfloat16
    kw = SERVE_KW if serve == "fast" else {}
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
    floor = False
    if per < FLOOR_S:
        # Sub-ms config: escalate K so the chain dominates the probe noise.
        per = probe(f"{model_name} x{scale} (K=64)", apply, params, x, 64,
                    log=None)
        floor = per < 0.25e-3 or per <= 0
    return per, floor


def quality_delta(model_name, scale, serve):
    """PSNR (dB) of the served config vs the exact f32 path, same weights.
    None for the parameter-free Bicubic (identical by construction).

    Runs on the DEFAULT device: the TPU during a matrix run (the Pallas
    serve kernels must compile natively — forcing them onto the host CPU
    inside a TPU process trips the 'interpret only' Mosaic error, and
    interpret mode is far too slow anyway), plain CPU+interpret in a
    CPU-only environment. Measured at the row's REAL 720p geometry (round-3
    proxied at 96x128, where Fast's border ring dominated the number —
    VERDICT r3 weak#3); the GT-delta counterpart on trained checkpoints +
    held-out frames is tools/matrix_quality.py."""
    if model_name == "BicubicInterpolation":
        return None
    from transformerupscaler_tpu.registry import get_model

    kw = SERVE_KW if serve == "fast" else {}
    key = jax.random.PRNGKey(0)
    geom = (720, 1280)
    x = jax.random.uniform(key, (1, *geom, 3), jnp.float32)
    exact = get_model(model_name, dtype=jnp.float32)
    params = exact.init(key, x, upscale_factor=scale)
    served = get_model(model_name, dtype=jnp.bfloat16, **kw)
    y_ref = np.asarray(
        jax.jit(lambda p, v: exact.apply(p, v, upscale_factor=scale))(
            params, x), np.float64)
    y_srv = np.asarray(
        jax.jit(lambda p, v: served.apply(p, v, upscale_factor=scale))(
            params, x.astype(jnp.bfloat16)), np.float64)
    err = float(np.mean((y_ref - y_srv) ** 2))
    if err == 0.0:
        return float("inf")
    return float(-10.0 * np.log10(err))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=str, default=",".join(MODELS))
    ap.add_argument("--scales", type=str, default="2,3,4,6")
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--serve", choices=["xla", "fast"], default="fast")
    ap.add_argument("--no_quality", action="store_true",
                    help="skip the CPU serving-quality column")
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import transformerupscaler_tpu  # noqa: F401 — applies the TUX_PLATFORM hook
    print(f"device: {jax.devices()[0]}  serve={args.serve}", flush=True)
    rows = []
    for model_name in args.models.split(","):
        for scale in (int(s) for s in args.scales.split(",")):
            try:
                per, floor = bench_one(model_name, scale, args.serve, args.k)
                row = {"model": model_name, "scale": scale}
                if floor:
                    # Don't publish a nonsense number: the config is faster
                    # than the probe can resolve.
                    row["fps_per_chip"] = None
                    row["ms_per_frame"] = None
                    row["floor"] = True
                    row["floor_note"] = (
                        f"below probe resolution (~{FLOOR_S*1e3:.1f} ms) "
                        f"even at K=64; best estimate {per*1e3:.3f} ms")
                else:
                    row["fps_per_chip"] = round(1.0 / per, 2)
                    row["ms_per_frame"] = round(per * 1e3, 3)
                if not args.no_quality:
                    # A quality failure must not discard the measured fps.
                    try:
                        q = quality_delta(model_name, scale, args.serve)
                        row["serve_psnr_vs_f32_db"] = (
                            None if q is None else round(q, 2))
                    except Exception as e:  # noqa: BLE001
                        row["quality_error"] = str(e)[:200]
                rows.append(row)
                ms = "  floor" if floor else f"{row['ms_per_frame']:8.2f} ms"
                fps = "" if floor else f"{row['fps_per_chip']:8.2f} fps"
                q = row.get("serve_psnr_vs_f32_db")
                qs = f"  q={q} dB" if q is not None else ""
                print(f"{model_name:24s} x{scale}  {ms}  {fps}{qs}",
                      flush=True)
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
