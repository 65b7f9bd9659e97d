#!/usr/bin/env python
"""Dataset exploration tool — the reference's data_manipulation.ipynb as a
script (reference data_handling/data_manipulation.ipynb cells 0-5: build a
720p-LR / native-HR pair dataset from a directory, optionally in YCbCr, and
sanity-check one batch's shapes).

Usage:
    python tools/data_explore.py --image_dir images/training_set \
        [--mode ycbcr|rgb] [--batch 16] [--lr_res 720]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from transformerupscaler_tpu.resolutions import resolutions


def load_pairs(image_dir: str, lr_hw, mode: str):
    """Yield (lr, hr) float32 [0,1] arrays; HWC, 3 channels."""
    exts = (".jpg", ".jpeg", ".png")
    files = sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir)
        if f.lower().endswith(exts))
    pil_mode = "YCbCr" if mode == "ycbcr" else "RGB"
    for path in files:
        hr_img = Image.open(path).convert(pil_mode)
        lr_img = hr_img.resize((lr_hw[1], lr_hw[0]), Image.BILINEAR)
        yield (np.asarray(lr_img, np.float32) / 255.0,
               np.asarray(hr_img, np.float32) / 255.0)


def main(args):
    lr_hw = resolutions[args.lr_res]
    pairs = load_pairs(args.image_dir, lr_hw, args.mode)
    batch_lr, batch_hr = [], []
    for lr, hr in pairs:
        batch_lr.append(lr)
        batch_hr.append(hr)
        if len(batch_lr) >= args.batch:
            break
    if not batch_lr:
        raise SystemExit(f"No images found in {args.image_dir}")
    lrs = np.stack(batch_lr)
    # HR images may differ in size; stack only if uniform (like the
    # reference's DataLoader, which requires it).
    hr_shapes = {h.shape for h in batch_hr}
    print(f"{len(batch_lr)} pairs ({args.mode})")
    print(f"LR batch: {lrs.shape}  range [{lrs.min():.3f}, {lrs.max():.3f}]")
    if len(hr_shapes) == 1:
        hrs = np.stack(batch_hr)
        print(f"HR batch: {hrs.shape}  range [{hrs.min():.3f}, {hrs.max():.3f}]")
    else:
        print(f"HR shapes (non-uniform, not stackable): {sorted(hr_shapes)}")
    for i, (lr, hr) in enumerate(zip(batch_lr[:3], batch_hr[:3])):
        print(f"  sample {i}: lr {lr.shape} hr {hr.shape} "
              f"mean {lr.mean():.4f}/{hr.mean():.4f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Explore a training-image dir")
    parser.add_argument("--image_dir", type=str, required=True)
    parser.add_argument("--mode", choices=["rgb", "ycbcr"], default="ycbcr")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--lr_res", type=str, default="720")
    main(parser.parse_args())
