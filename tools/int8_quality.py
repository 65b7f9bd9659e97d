#!/usr/bin/env python
"""Quality gate for the int8 serving mode.

For real images and a trained FastTransformer checkpoint, measures:
  - PSNR(int8_serve output, f32-path output): the quantization error itself
  - PSNR(model output, ground truth) for f32 vs int8 (the delta is what the
    BASELINE.md <=0.05 dB bar is about)
  - clip risk of the static calibration on every eval frame
    (UpscalerEngine.calibration_check: dynamic-vs-static scale ratios)

Calibration uses the FIRST --calib_frames images (per-channel max across
frames + margin); evaluation runs on the REMAINING frames, so the reported
deltas are held-out. Geometry and checkpoint are flags so the gate can run
across >=2 checkpoints x >=2 geometries.

Usage:
  python tools/int8_quality.py [--images N] [--calib_frames K]
      [--scope residual|full] [--res_out H,W] [--checkpoint_dir D]
      [--margin M] [--calib static|dynamic]
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
    ap.add_argument("--images", type=int, default=14,
                    help="total images (first --calib_frames calibrate, "
                         "the rest evaluate)")
    ap.add_argument("--calib_frames", type=int, default=10)
    ap.add_argument("--calib", choices=["static", "dynamic"],
                    default="static")
    ap.add_argument("--scope", choices=["full", "residual", "tails"],
                    default="full")
    ap.add_argument("--margin", type=float, default=1.25)
    ap.add_argument("--res_out", type=str, default="1440,2560",
                    help="output geometry H,W (input is 720p)")
    ap.add_argument("--checkpoint_dir", type=str, default=None)
    ap.add_argument("--gptq", action="store_true",
                    help="GPTQ + bias-correct the image-branch weights "
                         "against the calibration frames (ops/gptq.py)")
    ap.add_argument("--no_bias_correct", action="store_true",
                    help="with --gptq: skip the mean-input bias correction "
                         "(diagnostic for systematic GT-delta shifts)")
    ap.add_argument("--int8_trunk", action="store_true",
                    help="also run the trunk GEMMs as rowwise int8 inside "
                         "the paired fused2 kernel (int8_trunk flag)")
    ap.add_argument("--image_dir", type=str, default=None,
                    help="override frame source (default: calibrate on the "
                         "TRAINING split, evaluate on the held-out split — "
                         "tools/eval_frames.heldout_paths)")
    args = ap.parse_args()

    from PIL import Image
    import jax.numpy as jnp
    from transformerupscaler_tpu.infer_lib import UpscalerEngine

    heldout_split = args.image_dir is None
    if heldout_split:
        # Calibration frames come FIRST (training split: the same frames
        # the checkpoint saw), then the held-out eval frames — static
        # calibration below slices calib off the front, so eval stays
        # genuinely unseen.
        from tools.eval_frames import TRAINING_SET, heldout_paths

        train_paths = sorted(glob.glob(os.path.join(TRAINING_SET, "*.png")))
        cal = (train_paths[:args.calib_frames]
               if args.calib == "static" else [])
        paths = cal + heldout_paths(n=args.images)
    else:
        paths = sorted(glob.glob(os.path.join(args.image_dir, "*.png")))
        paths = paths[:args.images]
    res_out = tuple(int(v) for v in args.res_out.split(","))

    eng_f = UpscalerEngine("FastTransformer", dtype=jnp.float32,
                           checkpoint_dir=args.checkpoint_dir,
                           compose_tails=True, packed_serve=True)
    eng_q = UpscalerEngine("FastTransformer", dtype=jnp.float32,
                           checkpoint_dir=args.checkpoint_dir,
                           compose_tails=True, int8_serve=True,
                           int8_scope=args.scope,
                           pallas_serve=args.scope == "tails",
                           int8_trunk=args.int8_trunk,
                           attn_impl="fused2" if args.int8_trunk else "xla")
    print(f"checkpoint: {eng_f.checkpoint_path}  res_out={res_out}  "
          f"scope={args.scope}  int8_trunk={args.int8_trunk}", flush=True)

    def load(p, wh):
        return np.asarray(Image.open(p).convert("RGB").resize(
            wh, Image.BICUBIC), np.float32) / 255.0

    lrs = [load(p, (1280, 720)) for p in paths]
    if args.calib == "static":
        n_cal = min(args.calib_frames, max(1, len(paths) - 2))
        eng_q.calibrate_int8(lrs[:n_cal], res_out=res_out,
                             margin=args.margin)
        print(f"calibrated on {n_cal} frames (margin {args.margin})",
              flush=True)
        if args.gptq:
            import math

            scale = math.ceil(max(res_out[0] / 720, res_out[1] / 1280))
            eng_q.gptq_int8(lrs[:n_cal], scale=scale,
                            bias_correct=not args.no_bias_correct)
            print(f"GPTQ'd image branch (scale {scale}, bias_correct="
                  f"{not args.no_bias_correct})", flush=True)
        eval_paths = list(zip(paths[n_cal:], lrs[n_cal:]))
    else:
        eval_paths = list(zip(paths, lrs))

    rows = []
    worst_clip = 0.0
    for p, lr in eval_paths:
        gt = load(p, (res_out[1], res_out[0]))
        y_f = eng_f.upscale(lr, res_out=res_out)
        y_q = eng_q.upscale(lr, res_out=res_out)
        row = {
            "image": os.path.basename(p),
            "psnr_q_vs_f32": psnr(y_q, y_f),
            "psnr_f32_gt": psnr(y_f, gt),
            "psnr_int8_gt": psnr(y_q, gt),
        }
        row["delta_gt"] = row["psnr_f32_gt"] - row["psnr_int8_gt"]
        clip = ""
        if args.calib == "static":
            rep = eng_q.calibration_check(lr, res_out=res_out)
            mr = max(v["max_ratio"] for v in rep.values())
            worst_clip = max(worst_clip, mr)
            clip = f"   clip-ratio {mr:5.2f}"
        rows.append(row)
        print(f"{row['image']:20s} int8-vs-f32 {row['psnr_q_vs_f32']:6.2f} dB"
              f"   f32-vs-GT {row['psnr_f32_gt']:6.2f}"
              f"   int8-vs-GT {row['psnr_int8_gt']:6.2f}"
              f"   delta {row['delta_gt']:+.4f} dB{clip}", flush=True)

    d = [r["delta_gt"] for r in rows]
    q = [r["psnr_q_vs_f32"] for r in rows]
    print(f"\nmean PSNR(int8, f32) = {np.mean(q):.2f} dB; "
          f"mean GT delta = {np.mean(d):+.4f} dB "
          f"(max {max(d):+.4f})", flush=True)
    if args.calib == "static":
        print(f"worst dynamic/static scale ratio across eval frames: "
              f"{worst_clip:.3f} ({'no clipping' if worst_clip <= 1.0 else 'CLIPPING'})",
              flush=True)


if __name__ == "__main__":
    main()
