#!/usr/bin/env python
"""Generate demo outputs for a trained model at 2x/3x/4x/6x.

Parity target: models/{name}/demo/ in the reference (component 14; the
reference's demo images survive but its trained checkpoints were stripped).
Writes, per scale: the downscaled input, the bicubic control, and the model
output, side by side.

Usage: python tools/make_demos.py [--model FastTransformer] [--image PATH]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="FastTransformer")
    parser.add_argument("--image",
                        default="/root/reference/images/training_set/image_109.png")
    parser.add_argument("--base", type=int, nargs=2, default=(180, 320),
                        help="LR input size (H W)")
    parser.add_argument("--out_dir", default=None)
    args = parser.parse_args()

    from transformerupscaler_tpu.infer_lib import UpscalerEngine
    from transformerupscaler_tpu.metrics import psnr, ssim

    out_dir = args.out_dir or os.path.join("models", args.model, "demo")
    os.makedirs(out_dir, exist_ok=True)

    src = Image.open(args.image).convert("RGB")
    h, w = args.base
    lr_img = src.resize((w, h), Image.BILINEAR)
    lr = np.asarray(lr_img, dtype=np.float32) / 255.0
    lr_img.save(os.path.join(out_dir, "input.png"))

    engine = UpscalerEngine(args.model)
    print(f"checkpoint: {engine.checkpoint_path}")

    for scale in (2, 3, 4, 6):
        out = engine.upscale(lr, upscale_factor=scale)
        out_img = Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8))
        out_img.save(os.path.join(out_dir, f"model_x{scale}.png"))
        bic = lr_img.resize((w * scale, h * scale), Image.BICUBIC)
        bic.save(os.path.join(out_dir, f"bicubic_x{scale}.png"))

        ref = np.asarray(src.resize((w * scale, h * scale), Image.BILINEAR),
                         dtype=np.float32) / 255.0
        bic_np = np.asarray(bic, dtype=np.float32) / 255.0
        print(f"x{scale}: model PSNR {psnr(ref, out):.2f} dB / SSIM "
              f"{ssim(ref, out):.4f} | bicubic PSNR {psnr(ref, bic_np):.2f} dB "
              f"/ SSIM {ssim(ref, bic_np):.4f}")


if __name__ == "__main__":
    main()
