#!/usr/bin/env python
"""Single-image upscaling CLI with quality scoring.

CLI parity with the reference inference.py:148-170 (same flags, defaults, and
output report). Differences by design: inference is always jit-compiled (the
TPU analogue of --compile, which is accepted as a no-op), and --quantize
applies int8 weight quantization over the linear layers (reference
inference.py:111-113 scope).

Usage:
    python inference.py --image_path img.png --model FastTransformer \
        --res_in 720 --scale 3 [--quantize]
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

from transformerupscaler_tpu.infer_lib import UpscalerEngine
from transformerupscaler_tpu.metrics import psnr, ssim
from transformerupscaler_tpu.resolutions import resolutions


def main(args):
    if args.scale not in [2, 3, 4, 6]:
        print(f"Resolution {args.scale} not found in supported output resolutions.")
        sys.exit(-1)
    if args.res_in:
        if args.res_in not in resolutions:
            print(f"Resolution {args.res_in} not found in supported input resolutions.")
            sys.exit(-1)
        res_in = resolutions[args.res_in]
    else:
        res_in = None

    import jax

    print(f"Running inference on device: {jax.devices()[0]}")

    # Load input image; optionally downscale to res_in (bilinear, like
    # torchvision Resize on PIL input).
    image = Image.open(args.image_path).convert("RGB")
    if res_in is not None:
        lr_image = image.resize((res_in[1], res_in[0]), Image.BILINEAR)
    else:
        lr_image = image
    lr = np.asarray(lr_image, dtype=np.float32) / 255.0

    lr_image.save(args.inp)
    print(f"Downscaled image saved to: {args.inp}")

    # Bicubic baseline (PIL BICUBIC, reference inference.py:82-85).
    bicubic_image = lr_image.resize(
        (lr.shape[1] * args.scale, lr.shape[0] * args.scale), Image.BICUBIC)
    bicubic_image.save("bicubic.jpg")
    print("Bicubic image saved to: bicubic.jpg")

    import jax.numpy as jnp

    # --dtype bf16 is the TPU analogue of the reference's fp16 autocast at
    # inference (reference inference.py:117-122); --int8_mlp routes the MLP
    # GEMMs through the true int8 MXU path (ops/quant.int8_dense).
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[args.dtype]
    if args.quality and dtype == jnp.float32:
        # serve_quality is a mode of the bf16 fast path (f32 image
        # boundaries at bf16 compute speed); at f32 it would be a no-op
        # superset of the exact path.
        print("--quality implies the bf16 serving path; using bf16 compute")
        dtype = jnp.bfloat16
    # --fast rides the Pallas stream kernels on TPU (the measured-best
    # serving path, PERFORMANCE.md); on other backends they would run in
    # interpret mode, so stay on the all-XLA packed path there. The
    # "tails" int8 scope lives inside the Pallas pipeline, so it forces
    # pallas_serve on (interpret-mode correct, but slow off-TPU).
    import jax

    on_tpu = jax.default_backend() == "tpu"
    # --quality implies the fast serving path (it is a mode OF that path).
    fast = args.fast or args.quality
    pallas = (fast and on_tpu) or args.int8_serve == "tails"
    engine = UpscalerEngine(args.model, checkpoint_dir=args.checkpoint_dir,
                            quantize=args.quantize, dtype=dtype,
                            int8_mlp=args.int8_mlp,
                            int8_serve=args.int8_serve != "off",
                            int8_scope=(args.int8_serve
                                        if args.int8_serve != "off"
                                        else "full"),
                            compose_tails=args.int8_serve != "off"
                                          or fast,
                            packed_serve=fast,
                            pallas_serve=pallas,
                            int8_trunk=args.int8_trunk,
                            serve_quality=args.quality,
                            attn_impl="fused2" if ((pallas and on_tpu)
                                                   or args.int8_trunk)
                                      else "xla")
    if engine.checkpoint_path:
        print(f"Loading checkpoint: {engine.checkpoint_path}")
    else:
        print(f"No checkpoint found for {args.model}; using random init")
    if args.quantize:
        print("Applied int8 weight quantization to linear layers.")

    out = engine.upscale(lr, upscale_factor=args.scale)
    n_params = engine.param_count()

    out_img = Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8))
    out_img.save(args.out)
    print(f"Upscaled image saved to: {args.out}")

    # Score vs the original (reference inference.py:128-145: compare at the
    # prediction's resolution; the low-res input is upscaled back as the
    # bicubic control arm).
    original = np.asarray(Image.open(args.image_path).convert("RGB"),
                          dtype=np.float32) / 255.0
    pred = np.asarray(Image.open(args.out).convert("RGB"), dtype=np.float32) / 255.0
    if original.shape[:2] != pred.shape[:2]:
        original = np.asarray(
            Image.open(args.image_path).convert("RGB").resize(
                (pred.shape[1], pred.shape[0]), Image.BILINEAR),
            dtype=np.float32) / 255.0
    lowres_up = np.asarray(
        Image.open(args.inp).convert("RGB").resize(
            (original.shape[1], original.shape[0]), Image.BILINEAR),
        dtype=np.float32) / 255.0

    model_ssim_val = ssim(original, pred, data_range=1, channel_axis=-1)
    model_psnr_val = psnr(original, pred, data_range=1)
    bicubic_ssim_val = ssim(original, lowres_up, data_range=1, channel_axis=-1)
    bicubic_psnr_val = psnr(original, lowres_up, data_range=1)

    print(f"Bicubic Scores:\tSSIM: {bicubic_ssim_val:.4f}, PSNR: {bicubic_psnr_val:.2f} dB")
    print(f"Model Scores:\tSSIM: {model_ssim_val:.4f}, PSNR: {model_psnr_val:.2f} dB")
    print(f"Model has {n_params} trainable parameters")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Inference script for the TPU Transformer upscaler with "
                    "dynamic input resolution, quantization, and jit compilation"
    )
    parser.add_argument("--image_path", type=str, default="images/training_set/image_100.jpg",
                        help="Path to the input image file")
    parser.add_argument("--model", type=str, default="FastTransformer",
                        help="Model name from the registry")
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="Directory containing model checkpoints (default: models/{model}/checkpoints/)")
    parser.add_argument("--scale", type=int, default=3,
                        help="Output resolution scale (2, 3, 4, 6)")
    parser.add_argument("--res_in", type=str, default=None,
                        help="Input resolution key (None for no downscaling)")
    parser.add_argument("--inp", type=str, default="input.jpg",
                        help="Output file path for the downscaled input image")
    parser.add_argument("--out", type=str, default="model.jpg",
                        help="Output file path for the upscaled output image")
    parser.add_argument("--compile", action="store_true",
                        help="Accepted for reference-CLI parity; jit is always on")
    parser.add_argument("--quantize", action="store_true",
                        help="Enable int8 quantization of linear layers")
    parser.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                        help="Inference compute dtype (bf16 = the TPU "
                             "analogue of the reference's fp16 autocast)")
    parser.add_argument("--fast", action="store_true",
                        help="packed bf16 serving fast path (compose_tails "
                             "+ width-2-packed pipeline; border-ring "
                             "deviation, see PERFORMANCE.md). Requires "
                             "scale in {2,3,4,6}, input h %% 8 == 0 and "
                             "w %% 16 == 0; other geometries fall back "
                             "with a warning")
    parser.add_argument("--quality", action="store_true",
                        help="serve_quality mode: the --fast bf16 serving "
                             "path with f32 image boundaries (the tails "
                             "emit f32 so the output never rounds through "
                             "bf16) — the joint north-star config, "
                             ">=120 fps at <=0.05 dB GT delta "
                             "(PERFORMANCE.md). Implies --fast")
    parser.add_argument("--int8_serve",
                        choices=["off", "residual", "full", "tails"],
                        default="off",
                        help="int8 conv/GEMM serving scope on the packed "
                             "path ('residual' keeps the image branch bf16)")
    parser.add_argument("--int8_mlp", action="store_true",
                        help="Run transformer MLP GEMMs on the int8 MXU path")
    parser.add_argument("--int8_trunk", action="store_true",
                        help="rowwise int8 trunk GEMMs inside the paired "
                             "fused2 kernel (composes with --fast/--int8_serve)")
    main(parser.parse_args())
