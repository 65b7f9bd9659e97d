#!/usr/bin/env python
"""Training CLI.

CLI parity with the reference train.py:161-194 (same flags and defaults,
including the stale ``StrippedTransformer`` default model name, which errors
with the available-model list — the reference errors there too). Additions:
``--dtype`` (bf16 default — the TPU replacement for GradScaler/fp16),
``--fallback_dir`` to feed the online dataset from disk in zero-egress
environments, and ``--traceback`` now captures a jax.profiler trace instead
of the tkinter stack sampler.
"""

import argparse
import contextlib

import jax
import jax.numpy as jnp

from transformerupscaler_tpu.data.datasets import (
    HighresImageDataset,
    OnlineHighresDataset,
)
from transformerupscaler_tpu.train_lib import Trainer


def main(args):
    print(f"Training on device: {jax.devices()[0]}")

    from transformerupscaler_tpu.resolutions import SCALE_PAIRS

    if args.pairs == "small":
        pairs = [p for p in SCALE_PAIRS if p["lr"] == (96, 96)]
    elif args.pairs == "720":
        # ResidualTransformer's pos_embed is baked to 720p inputs
        # (reference ResidualTransformer/model.py:99) — train on the three
        # 720p->{1080p,1440p,4K} pairs only.
        pairs = [p for p in SCALE_PAIRS if p["lr"] == (720, 1280)]
    else:
        pairs = None
    if args.data_dir is None:
        dataset = OnlineHighresDataset(fallback_dir=args.fallback_dir)
        if pairs is not None:
            dataset.scale_pairs = pairs
            dataset.num_scale_pairs = len(pairs)
    else:
        # uint8 samples + HBM-resident cache: the tunneled TPU host link
        # moves ~17 MB/s, so f32 4K batches re-sent every epoch dominated
        # training wall-clock (30+ s/step measured).
        dataset = HighresImageDataset(args.data_dir, scale_pairs=pairs,
                                      cache=True, uint8=True)

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[args.dtype]
    mesh = None
    if args.mesh:
        from transformerupscaler_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh if args.mesh > 0 else None, tp=args.tp)
        print(f"Device mesh: {dict(mesh.shape)} (DP gradient all-reduce "
              f"over ICI; params replicated)")
    trainer = Trainer(args.model, checkpoint_dir=args.checkpoint_dir,
                      learning_rate=args.lr, dtype=dtype, mesh=mesh)

    ctx = (jax.profiler.trace(args.trace_dir)
           if args.traceback else contextlib.nullcontext())
    with ctx:
        trainer.fit(dataset, epochs=args.epochs, batch_size=args.batch_size,
                    log_interval=args.log_interval,
                    checkpoint_interval=args.checkpoint_interval,
                    device_cache=(args.data_dir is not None
                                  and not args.no_device_cache))
    if args.traceback:
        print(f"Profiler trace written to {args.trace_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Train the TransformerModel for image upscaling on TPU")
    parser.add_argument("--data_dir", type=str, default=None,
                        help="Path to the directory containing training images (.png)")
    parser.add_argument("--fallback_dir", type=str, default=None,
                        help="Feed the online dataset from this directory instead of the network")
    parser.add_argument("--batch_size", type=int, default=6,
                        help="Batch size for training")
    parser.add_argument("--epochs", type=int, default=10,
                        help="Number of training epochs")
    parser.add_argument("--lr", type=float, default=1e-4,
                        help="Learning rate for optimizer")
    parser.add_argument("--log_interval", type=int, default=1,
                        help="Interval (in batches) to log training progress")
    parser.add_argument("--checkpoint_interval", type=int, default=1,
                        help="Save model checkpoint every n epochs")
    parser.add_argument("--model", type=str, default="StrippedTransformer",
                        help="Model name from the registry")
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="Directory to save model checkpoints (default: models/{model}/checkpoints/)")
    parser.add_argument("--pairs", choices=["all", "small", "720"],
                        default="all",
                        help="Restrict training to the small 96x96 pairs or "
                             "the 720p-input pairs (ResidualTransformer)")
    parser.add_argument("--dtype", choices=["bf16", "f32"], default="bf16",
                        help="Training compute dtype (params and loss stay f32)")
    parser.add_argument("--mesh", type=int, default=0,
                        help="Train data-parallel over a device mesh of this "
                             "many chips (-1 = all devices; 0 = single device)")
    parser.add_argument("--tp", type=int, default=1,
                        help="Tensor-parallel (model axis) size within the mesh")
    parser.add_argument("--no_device_cache", action="store_true",
                        help="Keep training samples host-side (the HBM-"
                             "resident cache OOMs on large-target runs)")
    parser.add_argument("--traceback", action="store_true",
                        help="Capture a jax.profiler trace of the run")
    parser.add_argument("--trace_dir", type=str, default="/tmp/tux_trace",
                        help="Directory for the profiler trace")
    main(parser.parse_args())
