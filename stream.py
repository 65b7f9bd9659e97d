#!/usr/bin/env python
"""Headless streaming upscale benchmark/pipeline (speed_test x app_overlay
successor).

Feeds frames (from a directory, or synthetic) through the double-buffered
StreamPipeline at a fixed geometry and prints the per-stage timing report in
the reference app_overlay's Ctrl-C format (app_overlay.py:421-428).

Usage:
    python stream.py --model FastTransformer --res_in 720 --res_out 1080 \
        [--source DIR] [--frames 100] [--save_last out.png]
"""

import argparse
import itertools
import os

import numpy as np

from transformerupscaler_tpu.resolutions import resolutions
from transformerupscaler_tpu.stream_lib import StreamPipeline


def frame_source(args, res_in):
    if args.source:
        from PIL import Image

        files = sorted(
            os.path.join(args.source, f) for f in os.listdir(args.source)
            if f.lower().endswith((".png", ".jpg")))
        def gen():
            for path in itertools.cycle(files):
                yield np.asarray(Image.open(path).convert("RGB"))
        return gen()
    rng = np.random.default_rng(0)
    frames = [(rng.random((*res_in, 3)) * 255).astype(np.uint8) for _ in range(8)]
    return itertools.cycle(frames)


def main(args):
    import jax

    res_in = resolutions[args.res_in]
    res_out = resolutions[args.res_out]
    print(f"Streaming on device: {jax.devices()[0]} | {res_in} -> {res_out}")

    # --fast = the PERFORMANCE.md headline serving config (Pallas stream
    # kernels + fused2 trunk) on TPU; off-TPU the Pallas kernels would run
    # in interpret mode, so fall back to the all-XLA packed path there.
    on_tpu = jax.default_backend() == "tpu"
    fast = args.fast or args.quality  # --quality is a mode OF the fast path
    pallas = (fast and on_tpu) or args.int8 == "tails"
    pipe = StreamPipeline(args.model, res_in, res_out,
                          checkpoint_dir=args.checkpoint_dir,
                          quantize=args.quantize, int8_mlp=args.int8_mlp,
                          int8_serve=args.int8 != "off",
                          int8_scope=args.int8 if args.int8 != "off" else "full",
                          compose_tails=fast or args.int8 != "off",
                          packed_serve=fast, pallas_serve=pallas,
                          serve_quality=args.quality,
                          attn_impl="fused2" if pallas and on_tpu
                                    else "xla")
    print(f"checkpoint loaded: {pipe.from_checkpoint}")
    t = pipe.warmup()
    print(f"compiled in {t:.1f}s")

    last = {}
    def sink(frame):
        last["frame"] = frame

    # The extra lead frame primes the one-ahead preprocessor.
    stats = pipe.run(frame_source(args, res_in), sink=sink,
                     max_frames=args.frames)
    print(f"\n{stats['frames']} frames in {stats['wall_s']:.2f}s "
          f"-> {stats['fps']:.2f} fps")
    print("Profiling results:")
    print(stats["report"])

    if args.save_last and "frame" in last:
        from PIL import Image

        Image.fromarray(last["frame"]).save(args.save_last)
        print(f"last frame saved to {args.save_last}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Streaming upscale pipeline")
    parser.add_argument("--model", type=str, default="FastTransformer")
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    parser.add_argument("--res_in", type=str, default="720",
                        help="Input resolution key")
    parser.add_argument("--res_out", type=str, default="1080",
                        help="Output resolution key")
    parser.add_argument("--source", type=str, default=None,
                        help="Directory of frames (cycled); synthetic if unset")
    parser.add_argument("--frames", type=int, default=50)
    parser.add_argument("--save_last", type=str, default=None)
    parser.add_argument("--quantize", action="store_true",
                        help="int8 weight quantization of linear layers")
    parser.add_argument("--int8",
                        choices=["off", "residual", "full", "tails"],
                        default="off",
                        help="int8 serving scope on the packed path "
                             "(PERFORMANCE.md; 'residual' keeps the "
                             "image-carrying branch bf16)")
    parser.add_argument("--int8_mlp", action="store_true",
                        help="true int8 MXU path for the transformer MLPs")
    parser.add_argument("--fast", action="store_true",
                        help="serving fast path: composed tails on the "
                             "all-XLA width-2-packed pipeline (border-ring "
                             "deviation, see PERFORMANCE.md)")
    parser.add_argument("--quality", action="store_true",
                        help="serve_quality mode of the fast path (f32 "
                             "image boundaries; worst-frame-bounded GT "
                             "delta, PERFORMANCE.md joint gate)")
    main(parser.parse_args())
