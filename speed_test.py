#!/usr/bin/env python
"""Throughput harness: per-image inference timing to 4K.

CLI parity with the reference speed_test.py:78-88 (same flags; same report:
summed per-image inference time, overall wall-clock, average per image; same
workload: every dataset item upscaled to res_out=(2160, 3840)).

TPU notes: the first forward per geometry compiles — compile time is reported
separately and excluded from per-image numbers (the reference's eager timings
have no compile either); device timing uses block_until_ready.
"""

import argparse
import time

import jax
import jax.numpy as jnp

from transformerupscaler_tpu.data.datasets import HighresImageDataset
from transformerupscaler_tpu.infer_lib import UpscalerEngine


def main(args):
    print(f"Running speed test on device: {jax.devices()[0]}")
    if args.mesh:
        return main_sharded(args)

    from transformerupscaler_tpu.resolutions import resolutions
    res_out = resolutions[args.res_out]
    # --fast adds the Pallas stream kernels on TPU (PERFORMANCE.md headline
    # config); "tails" int8 scope requires them on any backend.
    on_tpu = jax.default_backend() == "tpu"
    # --quality implies the fast serving path (it is a mode OF that path).
    fast = args.fast or args.quality
    pallas = (fast and on_tpu) or args.int8 == "tails"
    engine = UpscalerEngine(args.model, checkpoint_dir=args.checkpoint_dir,
                            dtype=jnp.bfloat16 if fast else jnp.float32,
                            compose_tails=fast,
                            packed_serve=fast,
                            pallas_serve=pallas,
                            serve_quality=args.quality,
                            attn_impl="fused2" if ((pallas and on_tpu)
                                                    or args.int8_trunk)
                                      else "xla",
                            int8_serve=args.int8 != "off",
                            int8_scope=(args.int8 if args.int8 != "off"
                                        else "full"),
                            int8_trunk=args.int8_trunk)
    if engine.checkpoint_path:
        print(f"Loading checkpoint from: {engine.checkpoint_path}")
    else:
        print(f"No checkpoint found for {args.model}; using random init")

    dataset = HighresImageDataset(args.data_dir)
    total_images = len(dataset)
    print(f"Processing {total_images} images...")

    total_inference_time = 0.0
    compile_time = 0.0
    seen_geometries = set()

    skipped = 0
    overall_start = time.time()
    for lr, _ in dataset:
        geom = lr.shape[:2]
        try:
            if geom not in seen_geometries:
                compile_time += engine.warmup(geom, res_out=res_out)
                seen_geometries.add(geom)
            start = time.time()
            out = engine.upscale(lr, res_out=res_out, device_out=True)
            jax.block_until_ready(out)
            total_inference_time += time.time() - start
        except ValueError as e:
            # e.g. FastTransformer's Upsampler supports scales {2,3,4,6};
            # a 96x96 sample to 4K implies scale 40 (the reference crashes
            # here — we skip and report).
            if not skipped:
                print(f"Skipping unsupported sample geometry {geom}: {e}")
            skipped += 1
            total_images -= 1
            seen_geometries.add(geom)
    overall_time = time.time() - overall_start
    if skipped:
        print(f"Skipped {skipped} samples with unsupported scales")

    average = total_inference_time / total_images if total_images else 0.0
    print(f"Compile time (excluded from per-image stats): {compile_time:.4f} seconds")
    print(f"Total inference time (sum over images): {total_inference_time:.4f} seconds")
    print(f"Overall wall-clock time: {overall_time:.4f} seconds")
    print(f"Average inference time per image: {average:.4f} seconds")


def main_sharded(args):
    """Multi-chip throughput: the image stream batch-sharded over the mesh's
    data axis (SURVEY §2.9's TPU-native scaling of this workload — each chip
    upscales its slice, no forward-path collectives)."""
    import numpy as np

    from transformerupscaler_tpu.checkpoint import load_latest_params
    from transformerupscaler_tpu.parallel.batch_infer import ShardedUpscaler
    from transformerupscaler_tpu.parallel.mesh import make_mesh

    from transformerupscaler_tpu.resolutions import resolutions
    res_out = resolutions[args.res_out]
    mesh = make_mesh(args.mesh if args.mesh > 0 else None)
    n = mesh.shape["data"]
    print(f"Device mesh: {dict(mesh.shape)} — batch-sharded inference")
    params = load_latest_params(args.model, args.checkpoint_dir)
    print("Loaded checkpoint" if params else "No checkpoint; random init")
    upscaler = ShardedUpscaler(args.model, mesh, params=params)

    dataset = HighresImageDataset(args.data_dir)
    groups: dict = {}
    skipped = 0
    for lr, _ in dataset:
        h, w = lr.shape[:2]
        scale = max(-(-res_out[0] // h), -(-res_out[1] // w))
        if scale not in (2, 3, 4, 6):
            skipped += 1
            continue
        groups.setdefault((h, w), []).append(np.asarray(lr))
    if skipped:
        print(f"Skipped {skipped} samples with unsupported scales")

    total_images = sum(len(v) for v in groups.values())
    print(f"Processing {total_images} images in {len(groups)} geometries...")
    compile_time = total_inference_time = 0.0
    overall_start = time.time()
    for geom, images in groups.items():
        batch = np.stack(images[:1] * n)
        t0 = time.time()
        jax.block_until_ready(upscaler.upscale_batch(batch, res_out))
        compile_time += time.time() - t0
        for i in range(0, len(images), n):
            chunk = np.stack(images[i:i + n])
            t0 = time.time()
            jax.block_until_ready(upscaler.upscale_batch(chunk, res_out))
            total_inference_time += time.time() - t0
    overall_time = time.time() - overall_start

    average = total_inference_time / total_images if total_images else 0.0
    print(f"Compile time (excluded from per-image stats): {compile_time:.4f} seconds")
    print(f"Total inference time (sum over images): {total_inference_time:.4f} seconds")
    print(f"Overall wall-clock time: {overall_time:.4f} seconds")
    print(f"Average inference time per image: {average:.4f} seconds")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Speed test for TPU Transformer upscaler inference")
    parser.add_argument("--data_dir", type=str, required=True,
                        help="Directory containing images for inference")
    parser.add_argument("--model", type=str, default="FastTransformer",
                        help="Model name from the registry")
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="Directory containing model checkpoints (default: models/{model}/checkpoints/)")
    parser.add_argument("--mesh", type=int, default=0,
                        help="Shard the image stream over a device mesh of "
                             "this many chips (-1 = all; 0 = single device)")
    parser.add_argument("--fast", action="store_true",
                        help="bf16 packed serving fast path (PERFORMANCE.md); "
                             "geometries outside the packed gate (scale in "
                             "{2,3,4,6}, h %% 8 == 0, w %% 16 == 0) fall "
                             "back with a warning")
    parser.add_argument("--quality", action="store_true",
                        help="serve_quality mode: the --fast bf16 path with "
                             "f32 image boundaries (joint north-star config, "
                             ">=120 fps at <=0.05 dB GT delta). Implies "
                             "--fast")
    parser.add_argument("--int8",
                        choices=["off", "residual", "full", "tails"],
                        default="off",
                        help="int8 serving scope on the packed path")
    parser.add_argument("--int8_trunk", action="store_true",
                        help="rowwise int8 trunk GEMMs inside the paired "
                             "fused2 kernel (composes with --fast/--int8)")
    parser.add_argument("--res_out", type=str, default="4k",
                        help="Output resolution name (reference hardcodes 4K "
                             "at speed_test.py:64; smaller values keep CI on "
                             "CPU meshes fast)")
    main(parser.parse_args())
