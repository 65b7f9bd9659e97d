#!/usr/bin/env python
"""Train a second, deliberately different FastTransformer checkpoint for the
int8 calibration stress gate (VERDICT r2 item 5: quality across >=2
checkpoints x >=2 geometries).

A short from-scratch run on small crops produces weights with genuinely
different statistics from the shipped ep-100 checkpoint (early-training
activations are broader and less channel-sparse — a harder test for the
static per-channel calibration than a later epoch of the same run would
be). CPU-runnable: small crops, few steps. The checkpoint lands in
models/FastTransformer/checkpoints_alt/ (local fixture, not committed —
~25 MB; the gate RESULTS are recorded in PERFORMANCE.md).

Usage: python tools/train_alt_ckpt.py [steps] [crop]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    crop = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from transformerupscaler_tpu.train_lib import Trainer

    # First 20 sorted files ONLY — the same reachable-by-training split as
    # the shipped checkpoints (tools/eval_frames.py): indices >= 20 are the
    # held-out quality-gate frames and must stay unseen by EVERY
    # checkpoint, including this fixture.
    image_paths = sorted(
        glob.glob("/root/reference/images/training_set/*.png"))[:20]
    assert image_paths, "training images missing"
    print(f"{len(image_paths)} source images, crop {crop}, {steps} steps",
          flush=True)

    rng = np.random.default_rng(0)
    imgs = []
    for p in image_paths:
        im = Image.open(p).convert("RGB")
        if im.width < crop or im.height < crop:
            continue
        imgs.append(np.asarray(im, np.float32) / 255.0)

    def sample_pair():
        im = imgs[rng.integers(len(imgs))]
        y = rng.integers(im.shape[0] - crop + 1)
        x = rng.integers(im.shape[1] - crop + 1)
        hr = im[y:y + crop, x:x + crop]
        # LR via the exact torchvision-semantics bicubic (the dataset's own
        # pair construction, ops/resize.py).
        from transformerupscaler_tpu.ops.resize import resize
        lr = np.asarray(resize(
            jnp.asarray(hr)[None], (crop // 2, crop // 2))[0])
        return np.clip(lr, 0.0, 1.0).astype(np.float32), hr

    tr = Trainer("FastTransformer",
                 checkpoint_dir="models/FastTransformer/checkpoints_alt",
                 dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(1)
    for step in range(steps):
        batch = [sample_pair() for _ in range(4)]
        key, sub = jax.random.split(key)
        loss = tr.train_step(batch, sub)
        if step % 20 == 0:
            print(f"step {step}: loss {loss:.5f}", flush=True)
    from transformerupscaler_tpu.checkpoint import save_checkpoint
    path = save_checkpoint(tr.checkpoint_dir, 1, tr.params, None)
    print(f"saved {path}", flush=True)


if __name__ == "__main__":
    main()
