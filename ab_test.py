#!/usr/bin/env python
"""A/B evaluation harness: per-sample MSE of two model variants over a
dataset.

CLI parity with the reference ab_test.py:140-161 (same flags, filters,
skip-non-upscale rule, and total/average report). Samples whose geometries
repeat hit the engines' jit caches, so the sweep compiles once per geometry.
"""

import argparse

import jax
import numpy as np

from transformerupscaler_tpu.data.datasets import HighresImageDataset
from transformerupscaler_tpu.infer_lib import UpscalerEngine
from transformerupscaler_tpu.metrics import mse


def _resize_to_height(img_hwc: np.ndarray, height: int) -> np.ndarray:
    """transforms.Resize(int) semantics: shorter side -> size, keep aspect.
    Reference ab_test.py:91-105 applies it to FLOAT tensors (bilinear,
    antialias) when the height filter mismatches — this stays on the exact
    float path (ops/resize.resize_antialias_bilinear) rather than
    round-tripping through uint8, which would inject quantization noise into
    the harness's MSE comparisons."""
    from transformerupscaler_tpu.ops.resize import resize_antialias_bilinear

    # torchvision _compute_resized_output_size: short side -> size, long side
    # truncated (int(size * long / short)), not rounded.
    h, w = img_hwc.shape[:2]
    if h <= w:
        new_h, new_w = height, max(1, int(w * height / h))
    else:
        new_w, new_h = height, max(1, int(h * height / w))
    out = resize_antialias_bilinear(
        jax.numpy.asarray(img_hwc, jax.numpy.float32), (new_h, new_w))
    return np.asarray(out, dtype=np.float32)


def main(args):
    print(f"Running AB test on device: {jax.devices()[0]}")

    dataset = HighresImageDataset(args.data_dir)

    engine_a = UpscalerEngine(args.model_a, checkpoint_dir=args.checkpoint_dir_a)
    engine_b = UpscalerEngine(args.model_b, checkpoint_dir=args.checkpoint_dir_b)
    print(f"Model A ({args.model_a}) checkpoint: {engine_a.checkpoint_path}")
    print(f"Model B ({args.model_b}) checkpoint: {engine_b.checkpoint_path}")

    total_loss_a = 0.0
    total_loss_b = 0.0
    processed = 0

    for batch_idx, (lr, hr) in enumerate(dataset):
        if args.res_in is not None and lr.shape[0] != args.res_in:
            lr = _resize_to_height(lr, args.res_in)
        if args.res_out is not None and hr.shape[0] != args.res_out:
            hr = _resize_to_height(hr, args.res_out)

        # Skip non-upscales (reference ab_test.py:108-109).
        if hr.shape[0] / lr.shape[0] <= 1 or hr.shape[1] / lr.shape[1] <= 1:
            continue

        target = (hr.shape[0], hr.shape[1])
        out_a = engine_a.upscale(lr, res_out=target)
        out_b = engine_b.upscale(lr, res_out=target)
        total_loss_a += mse(out_a, hr)
        total_loss_b += mse(out_b, hr)
        processed += 1
        if (batch_idx + 1) % args.log_interval == 0:
            print(f"Processed {processed} samples so far...")

    if processed == 0:
        print("No samples matched the specified resolution criteria.")
        return

    print("========================================")
    print(f"Model A ({args.model_a}) Total Loss: {total_loss_a:.6f} | "
          f"Average Loss: {total_loss_a / processed:.6f}")
    print(f"Model B ({args.model_b}) Total Loss: {total_loss_b:.6f} | "
          f"Average Loss: {total_loss_b / processed:.6f}")
    print("========================================")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="AB Test for TPU Transformer Upscaler Models")
    parser.add_argument("--data_dir", type=str, default="images/training_set",
                        help="Directory containing images (.png)")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="Accepted for reference-CLI parity (iteration is per-sample)")
    parser.add_argument("--log_interval", type=int, default=10,
                        help="Log progress every N samples")
    parser.add_argument("--model_a", type=str, required=True, help="Model A name")
    parser.add_argument("--model_b", type=str, required=True, help="Model B name")
    parser.add_argument("--checkpoint_dir_a", type=str, default=None,
                        help="Checkpoint directory for model A (default: models/{model_a}/checkpoints/)")
    parser.add_argument("--checkpoint_dir_b", type=str, default=None,
                        help="Checkpoint directory for model B (default: models/{model_b}/checkpoints/)")
    parser.add_argument("--res_in", type=int, default=None,
                        help="Restrict to LR images with this height")
    parser.add_argument("--res_out", type=int, default=None,
                        help="Restrict to HR images with this height")
    main(parser.parse_args())
