#!/usr/bin/env python
"""Numerical parity check: run our JAX model and the reference PyTorch model
with IDENTICAL weights on the same image and report the PSNR between their
outputs (plus max abs diff).

The parity bar from BASELINE.md is <= 0.05 dB PSNR delta; identical weights
on the same input should yield a near-infinite PSNR between implementations
(>= 60 dB here flags success at f32).

Usage:
    python tools/parity_check.py --model FastTransformer --scale 2 \
        [--image /root/reference/images/training_set/image_103.png]
        [--checkpoint path/to/model_epoch_N.pth]   # else random torch init
Requires the reference repo (REFERENCE_PATH env, default /root/reference).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="FastTransformer")
    parser.add_argument("--scale", type=int, default=2)
    parser.add_argument("--image", default="/root/reference/images/training_set/image_103.png")
    parser.add_argument("--res_in", type=int, nargs=2, default=(180, 320),
                        help="downscale the image to this size first")
    parser.add_argument("--checkpoint", default=None,
                        help=".pth state_dict to load into BOTH models")
    args = parser.parse_args()

    reference = os.environ.get("REFERENCE_PATH", "/root/reference")
    sys.path.insert(0, reference)

    # torchvision shim (not installed in this image; reference imports it for
    # transforms.Resize on tensors = antialiased bilinear).
    import types

    import torch
    import torch.nn.functional as F

    class _Resize:
        def __init__(self, size):
            self.size = tuple(size) if isinstance(size, (tuple, list)) else size

        def __call__(self, t):
            return F.interpolate(t, size=self.size, mode="bilinear",
                                 align_corners=False, antialias=True)

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.Resize = _Resize
    tv.transforms = tvt
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)

    import importlib

    from PIL import Image

    import jax

    jax.config.update("jax_platforms", "cpu")  # exact f32 parity on CPU

    from transformerupscaler_tpu.metrics import psnr
    from transformerupscaler_tpu.registry import get_model
    from transformerupscaler_tpu.tools.torch_convert import convert_state_dict

    h, w = args.res_in
    img = Image.open(args.image).convert("RGB").resize((w, h), Image.BILINEAR)
    x = np.asarray(img, dtype=np.float32) / 255.0

    # Reference model.
    ref_mod = importlib.import_module(f"models.{args.model}.model")
    torch.manual_seed(0)
    ref = ref_mod.TransformerModel().eval()
    if args.checkpoint:
        ref.load_state_dict(torch.load(args.checkpoint, map_location="cpu",
                                       weights_only=True))
    xt = torch.from_numpy(x.transpose(2, 0, 1))[None]
    with torch.no_grad():
        if args.model == "BicubicInterpolation":
            yt = ref(xt, res_out=(h * args.scale, w * args.scale))
        else:
            yt = ref(xt, upscale_factor=args.scale)
    ref_out = yt[0].numpy().transpose(1, 2, 0)

    # Our model with the SAME weights.
    ours = get_model(args.model)
    params = convert_state_dict(ref.state_dict(), args.model)
    if args.model == "BicubicInterpolation":
        out = ours.apply(params, x[None], res_out=(h * args.scale, w * args.scale))
    else:
        out = ours.apply(params, x[None], upscale_factor=args.scale)
    our_out = np.asarray(out[0])

    diff = np.abs(our_out - ref_out)
    p = psnr(our_out, ref_out, data_range=1.0)
    print(f"model={args.model} scale={args.scale} in={h}x{w} "
          f"out={ref_out.shape[0]}x{ref_out.shape[1]}")
    print(f"max |diff| = {diff.max():.3e}   mean = {diff.mean():.3e}")
    print(f"PSNR(ours, reference) = {p:.2f} dB "
          f"({'PASS' if p >= 60 or np.isinf(p) else 'FAIL'}; bar: >=60 dB, "
          f"north-star delta bar 0.05 dB)")


if __name__ == "__main__":
    main()
