#!/usr/bin/env python
"""Rank the serving path's bf16 roundings by their fidelity cost (CPU).

The headline serving config runs every inter-op tensor in bf16; its
GT PSNR delta equals the statistical floor of its ~55-57 dB fidelity to
the exact f32 path (PERFORMANCE.md quality-gate section), and the joint
north star (<=0.05 dB at >=120 fps) needs ~+2-5 dB more fidelity. Each
candidate f32 boundary costs different fps on TPU (hi/lo conv1 is ~free;
hi/lo tail reads double the tail kernels), so this tool measures WHICH
roundings actually bind — on CPU, where a run costs no TPU window.

Method: run the all-XLA packed path (packed_serve; round 3 measured its
GT delta tracking the Pallas arms frame-by-frame) with the model at f32,
and INJECT bf16 round-trips at every operand/weight/output the real bf16
pipeline rounds — except the stages under test, which stay f32. Compute
between roundings is f32 — exactly the MXU's f32-accumulation semantics,
so the injected model reproduces the real path's rounding structure
faithfully (the one optimistic spot: trunk INTERNALS stay f32; tokens are
rounded at the trunk boundary, and the trunk feeds only the residual
branch). Fidelity is vs the reference-exact arm with the border cropped
(the compose ring is a deviation, not a rounding) and vs the compose-f32
arm (ring-free pure rounding effect).

Stage keys (kept = stays f32):
  input  x operand of conv1            w1     conv1 weights
  feat1  conv1 out -> conv2 operand    w2     conv2 + dec conv weights
  feat   conv2 out (tailA/embed/skip)  wtails composed tail weights
  dec    dec conv out -> tailB         tails  a12/b12 + squash + clip
  trunk  tokens through the trunk

Usage: python tools/fidelity_rank.py [--frames N] [--hw H,W]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TUX_PLATFORM", "cpu")

import numpy as np


def psnr(a, b, crop=0):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if crop:
        a = a[:, crop:-crop, crop:-crop]
        b = b[:, crop:-crop, crop:-crop]
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


class Patcher:
    """Inject bf16 round-trips into the f32 packed path except ``keep``."""

    def __init__(self, keep):
        self.keep = set(keep)
        self.conv_calls = 0

    def __enter__(self):
        import jax.numpy as jnp
        from transformerupscaler_tpu.models import common as common_mod
        from transformerupscaler_tpu.ops import conv as conv_mod
        from transformerupscaler_tpu.ops import patch as patch_mod
        import importlib

        resize_mod = importlib.import_module(
            "transformerupscaler_tpu.ops.resize")
        fast_mod = importlib.import_module(
            "transformerupscaler_tpu.models.fast_transformer")

        self._saved = (conv_mod.conv2d_packed_raw,
                       conv_mod.conv2d_tail_packed,
                       patch_mod.patch_embed_packed,
                       patch_mod.patch_unembed_packed,
                       common_mod.run_window_trunk,
                       resize_mod.resize_shuffled,
                       fast_mod.resize_shuffled)
        keep = self.keep
        patcher = self

        def rt(t):  # bf16 round-trip, staying f32
            return t.astype(jnp.bfloat16).astype(jnp.float32)

        def conv_raw(xp, kernel, bias=None, relu=False):
            patcher.conv_calls += 1
            n = patcher.conv_calls  # 1 = conv1, 2 = conv2, 3 = dec conv
            if n == 1:
                if "input" not in keep:
                    xp = rt(xp)
                if "w1" not in keep:
                    kernel = rt(kernel)
            else:
                if "w2" not in keep:
                    kernel = rt(kernel)
            out = patcher._saved[0](xp, kernel, bias, relu)
            okey = {1: "feat1", 2: "feat", 3: "dec"}[min(n, 3)]
            return out if okey in keep else rt(out)

        def tail(xp, kernel, bias=None, relu=False, block=8):
            if "wtails" not in keep:
                kernel = rt(kernel)
            out = patcher._saved[1](xp, kernel, bias, relu, block)
            return out if "tails" in keep else rt(out)

        def embed(xp, kernel, bias=None):
            out = patcher._saved[2](rt(xp) if "feat" not in keep else xp,
                                    rt(kernel), bias)
            return out if "trunk" in keep else rt(out)

        def unembed(tok, kernel, bias=None):
            out = patcher._saved[3](tok if "trunk" in keep else rt(tok),
                                    rt(kernel), bias)
            return out if "trunk" in keep else rt(out)

        def trunk(tokens, blocks, window_size, deterministic=True,
                  int8_acts=None):
            out = patcher._saved[4](
                tokens if "trunk" in keep else rt(tokens), blocks,
                window_size, deterministic=deterministic,
                int8_acts=int8_acts)
            return out if "trunk" in keep else rt(out)

        def squash(z, r, out_hw, method="bilinear", antialias=True,
                   a=None, precision=None):
            if "tails" not in keep:
                z = rt(z)
            out = patcher._saved[5](z, r, out_hw, method, antialias, a,
                                    precision)
            return out if "tails" in keep else rt(out)

        conv_mod.conv2d_packed_raw = conv_raw
        conv_mod.conv2d_tail_packed = tail
        patch_mod.patch_embed_packed = embed
        patch_mod.patch_unembed_packed = unembed
        common_mod.run_window_trunk = trunk
        resize_mod.resize_shuffled = squash
        fast_mod.resize_shuffled = squash
        return self

    def __exit__(self, *a):
        from transformerupscaler_tpu.models import common as common_mod
        from transformerupscaler_tpu.ops import conv as conv_mod
        from transformerupscaler_tpu.ops import patch as patch_mod
        import importlib

        resize_mod = importlib.import_module(
            "transformerupscaler_tpu.ops.resize")
        fast_mod = importlib.import_module(
            "transformerupscaler_tpu.models.fast_transformer")

        (conv_mod.conv2d_packed_raw, conv_mod.conv2d_tail_packed,
         patch_mod.patch_embed_packed, patch_mod.patch_unembed_packed,
         common_mod.run_window_trunk, resize_mod.resize_shuffled,
         fast_mod.resize_shuffled) = self._saved


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--hw", type=str, default="360,640")
    ap.add_argument("--image_dir", type=str, default=None,
                    help="override frame source (default: the held-out "
                         "split, tools/eval_frames.heldout_paths)")
    ap.add_argument("--crop", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image
    from transformerupscaler_tpu.checkpoint import (
        default_checkpoint_dir,
        get_latest_checkpoint,
        load_checkpoint,
    )
    from transformerupscaler_tpu.registry import get_model

    h, w = (int(v) for v in args.hw.split(","))
    res_out = (h * 3 // 2, w * 3 // 2)  # the headline's 3/4-of-2x squash

    path, _ = get_latest_checkpoint(
        default_checkpoint_dir("FastTransformer", "."))
    params = {"params": load_checkpoint(path, "FastTransformer")["params"]}

    if args.image_dir is None:
        from tools.eval_frames import heldout_paths

        paths = heldout_paths()
    else:
        paths = sorted(glob.glob(os.path.join(args.image_dir, "*.png")))
    frames = []
    for p in paths[: args.frames]:
        im = Image.open(p).convert("RGB").resize((w, h), Image.BICUBIC)
        frames.append(np.asarray(im, np.float32)[None] / 255.0)

    exact = get_model("FastTransformer", dtype=jnp.float32)
    pk32 = get_model("FastTransformer", dtype=jnp.float32,
                     compose_tails=True, packed_serve=True)

    y_exact = [np.asarray(jax.jit(
        lambda x: exact.apply(params, x, res_out=res_out))(x), np.float32)
        for x in frames]
    y_cf32 = [np.asarray(jax.jit(
        lambda x: pk32.apply(params, x, res_out=res_out))(x), np.float32)
        for x in frames]
    print(f"geometry {h}x{w} -> {res_out}; compose-f32 ring fidelity "
          f"{np.mean([psnr(a, b) for a, b in zip(y_cf32, y_exact)]):.2f} dB "
          f"(interior "
          f"{np.mean([psnr(a, b, args.crop) for a, b in zip(y_cf32, y_exact)]):.2f})",
          flush=True)

    ALL = ("input", "w1", "feat1", "w2", "feat", "dec", "wtails", "tails",
           "trunk")
    variants = [
        ("base (all bf16)", ()),
        ("input", ("input",)),
        ("input+w1", ("input", "w1")),
        ("feat1", ("feat1",)),
        ("w2", ("w2",)),
        ("feat", ("feat",)),
        ("dec", ("dec",)),
        ("wtails", ("wtails",)),
        ("tails", ("tails",)),
        ("trunk", ("trunk",)),
        ("QUALITY (input+w1+tails)", ("input", "w1", "tails")),
        ("quality+feat", ("input", "w1", "tails", "feat")),
        ("quality+dec", ("input", "w1", "tails", "dec")),
        ("quality+feat+dec", ("input", "w1", "tails", "feat", "dec")),
        ("quality+wtails", ("input", "w1", "tails", "wtails")),
        ("quality+feat1+w2", ("input", "w1", "tails", "feat1", "w2")),
        ("all", ALL),
    ]

    for name, keep in variants:
        with Patcher(keep) as p:
            def fwd(x, _p=p):
                _p.conv_calls = 0
                return pk32.apply(params, x, res_out=res_out)

            fj = jax.jit(fwd)
            ys = [np.asarray(fj(x), np.float32) for x in frames]
        f_vs_exact = np.mean([psnr(a, b, args.crop)
                              for a, b in zip(ys, y_exact)])
        f_vs_cf32 = np.mean([psnr(a, b) for a, b in zip(ys, y_cf32)])
        print(f"{name:28s} interior-vs-exact {f_vs_exact:6.2f} dB   "
              f"vs-compose-f32 {f_vs_cf32:6.2f} dB", flush=True)


if __name__ == "__main__":
    main()
