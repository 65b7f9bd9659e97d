#!/usr/bin/env python
"""Quality gate for the int8 serving mode.

For real images and the trained FastTransformer checkpoint, measures:
  - PSNR(int8_serve output, f32-path output): the quantization error itself
  - PSNR(model output, ground truth) for f32 vs int8 (the delta is what the
    BASELINE.md <=0.05 dB bar is about)

Workload mirrors tools/make_demos.py: a 4K ground truth image downscaled to
720p input, upscaled 2x by the model, compared against the 1440p-downscaled
ground truth.

Usage: python tools/int8_quality.py [--images N] [--calib static|dynamic]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--calib", choices=["static", "dynamic"],
                    default="static")
    ap.add_argument("--scope", choices=["full", "residual"], default="full")
    ap.add_argument("--margin", type=float, default=1.25)
    ap.add_argument("--image_dir", type=str,
                    default="/root/reference/images/training_set")
    args = ap.parse_args()

    from PIL import Image
    import jax.numpy as jnp
    from transformerupscaler_tpu.infer_lib import UpscalerEngine

    paths = sorted(glob.glob(os.path.join(args.image_dir, "*.png")))
    paths = paths[:args.images]

    eng_f = UpscalerEngine("FastTransformer", dtype=jnp.float32,
                           compose_tails=True, packed_serve=True)
    eng_q = UpscalerEngine("FastTransformer", dtype=jnp.float32,
                           compose_tails=True, int8_serve=True,
                           int8_scope=args.scope)
    print(f"checkpoint: {eng_f.checkpoint_path}", flush=True)

    res_out = (1440, 2560)
    first = True
    rows = []
    for p in paths:
        img = Image.open(p).convert("RGB")
        lr = np.asarray(img.resize((1280, 720), Image.BICUBIC),
                        np.float32) / 255.0
        gt = np.asarray(img.resize((2560, 1440), Image.BICUBIC),
                        np.float32) / 255.0
        if first and args.calib == "static":
            scales = eng_q.calibrate_int8(lr, res_out=res_out,
                                          margin=args.margin)
            print(f"calibrated ({len(scales)} scale groups, "
                  f"margin {args.margin})", flush=True)
            first = False
        y_f = eng_f.upscale(lr, res_out=res_out)
        y_q = eng_q.upscale(lr, res_out=res_out)
        row = {
            "image": os.path.basename(p),
            "psnr_q_vs_f32": psnr(y_q, y_f),
            "psnr_f32_gt": psnr(y_f, gt),
            "psnr_int8_gt": psnr(y_q, gt),
        }
        row["delta_gt"] = row["psnr_f32_gt"] - row["psnr_int8_gt"]
        rows.append(row)
        print(f"{row['image']:20s} int8-vs-f32 {row['psnr_q_vs_f32']:6.2f} dB"
              f"   f32-vs-GT {row['psnr_f32_gt']:6.2f}"
              f"   int8-vs-GT {row['psnr_int8_gt']:6.2f}"
              f"   delta {row['delta_gt']:+.4f} dB", flush=True)

    d = [r["delta_gt"] for r in rows]
    q = [r["psnr_q_vs_f32"] for r in rows]
    print(f"\nmean PSNR(int8, f32) = {np.mean(q):.2f} dB; "
          f"mean GT delta = {np.mean(d):+.4f} dB "
          f"(max {max(d):+.4f})", flush=True)


if __name__ == "__main__":
    main()
