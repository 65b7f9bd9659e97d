#!/usr/bin/env python
"""GT quality gate at REAL geometries for every serving matrix row.

tools/headline_quality.py gates only the headline cell (FastTransformer
x2 at 720p->1080p). Round 3's matrix carried a serve-fidelity column
measured at a 96x128 proxy geometry, which is not interpretable as the
row's real serving fidelity (VERDICT r3 weak#3) — and the int8 x3 finding
(PERFORMANCE.md) proved the same fidelity can pass at one scale and fail
at another because the GT-relative error floor scales with model accuracy:

    delta_floor(dB) = 10*log10(1 + 10^((G - F)/10))

with G = PSNR(exact, GT) (model accuracy) and F = PSNR(served, exact)
(serving fidelity). This tool measures all three quantities per row at
the row's REAL 720p-input geometry, on the trained checkpoints, over
genuinely held-out frames (tools/eval_frames.py), and reports the
measured GT delta next to the floor the law predicts.

Rows: FastTransformer x3/x4/x6 + WindowTransformer x2 + ResidualTransformer
x2 by default (Fast x2 IS the headline gate; Bicubic is parameter-free so
served == exact by construction). Served config = the matrix's fast-path
kwargs (compose_tails + packed/pallas serve + fused2), exact = the f32
parity config (144-160 dB vs the PyTorch reference, tools/parity_check.py).

Usage:
  python tools/matrix_quality.py [--rows Fast:3,Fast:4] [--images N]
      [--json MATRIX_QUALITY.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHORT = {"Fast": "FastTransformer", "Window": "WindowTransformer",
         "Residual": "ResidualTransformer"}
# Fast:6 LAST: its exact-f32 engine at the full x6 geometry can exceed the
# tunnel's remote-compile service limits (HTTP 500, same class as the
# train-bucket HTTP 413 in PERFORMANCE.md) — keep a failure there from
# costing the other rows.
DEFAULT_ROWS = ["Fast:3", "Fast:4", "Window:2", "Residual:2", "Fast:6"]
SERVE_KW = dict(compose_tails=True, packed_serve=True, pallas_serve=True,
                attn_impl="fused2")


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def floor_db(g, f):
    """GT-delta statistical floor for fidelity f at model accuracy g."""
    return 10 * np.log10(1.0 + 10 ** ((g - f) / 10.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=str, default=",".join(DEFAULT_ROWS))
    ap.add_argument("--images", type=int, default=6)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--quality", action="store_true",
                    help="serve with serve_quality (f32 image boundaries) "
                         "— the floor-law fix for rows whose fidelity-bound "
                         "delta exceeds the target (FastTransformer only; "
                         "other variants ignore the field)")
    args = ap.parse_args()

    from PIL import Image
    import jax.numpy as jnp
    from transformerupscaler_tpu.infer_lib import UpscalerEngine
    from tools.eval_frames import heldout_paths

    paths = heldout_paths(n=args.images)

    def load(p, wh):
        return np.asarray(Image.open(p).convert("RGB").resize(
            wh, Image.BICUBIC), np.float32) / 255.0

    out_rows = []

    def flush_json():
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out_rows, f, indent=1)

    for spec in args.rows.split(","):
        name, s = spec.split(":")
        model, scale = SHORT.get(name, name), int(s)
        res_out = (720 * scale, 1280 * scale)
        try:
            eng_exact = UpscalerEngine(model, dtype=jnp.float32)
            eng_srv = UpscalerEngine(model, dtype=jnp.bfloat16,
                                     serve_quality=args.quality, **SERVE_KW)
            g_l, f_l, d_l = [], [], []
            for p in paths:
                lr = load(p, (1280, 720))
                gt = load(p, (res_out[1], res_out[0]))
                y_e = np.asarray(eng_exact.upscale(lr, res_out=res_out),
                                 np.float32)
                y_s = np.asarray(eng_srv.upscale(lr, res_out=res_out),
                                 np.float32)
                g_l.append(psnr(y_e, gt))
                f_l.append(psnr(y_s, y_e))
                d_l.append(g_l[-1] - psnr(y_s, gt))
            row = {
                "model": model, "scale": scale,
                "serve": "quality" if args.quality else "fast",
                "frames": len(paths),
                "psnr_exact_gt_db": round(float(np.mean(g_l)), 3),
                "fidelity_serve_vs_exact_db": round(float(np.mean(f_l)), 2),
                "gt_delta_db": round(float(np.mean(d_l)), 4),
                "gt_delta_max_db": round(float(np.max(d_l)), 4),
                "floor_law_db": round(
                    float(floor_db(np.mean(g_l), np.mean(f_l))), 4),
            }
            out_rows.append(row)
            print(f"{model:24s} x{scale}  G={row['psnr_exact_gt_db']:6.2f} "
                  f"F={row['fidelity_serve_vs_exact_db']:6.2f}  "
                  f"GT delta {row['gt_delta_db']:+.4f} dB "
                  f"(max {row['gt_delta_max_db']:+.4f}, "
                  f"floor {row['floor_law_db']:+.4f})", flush=True)
        except Exception as e:  # noqa: BLE001 — a row must not cost the rest
            out_rows.append({"model": model, "scale": scale,
                             "error": str(e)[:300]})
            print(f"{model:24s} x{scale}  ERROR {str(e)[:200]}", flush=True)
        flush_json()  # incremental: a later crash keeps earlier rows
    if args.json:
        print(f"written: {args.json}")


if __name__ == "__main__":
    main()
