#!/usr/bin/env python
"""Serving-aware fine-tune experiment (VERDICT r4 task 7).

Hypothesis (from the conv1-exact negative result, PERFORMANCE.md round-4):
the ep-100 checkpoint co-adapted to its bf16 TRAINING forward, so a short
fine-tune whose forward matches the SERVING math should realign the
weights and buy GT margin no f32 boundary can.

The Pallas serving kernels have no VJPs (inference-only), so the closest
differentiable serving surrogate is ``compose_tails=True`` at bf16: the
branch tails train through the same composed 5x5/7x7 kernels (traced
weight math — gradients flow through the composition) and the same bf16
rounding class the packed/Pallas path serves with. What it cannot capture
is Pallas-vs-XLA reassociation (~55-60 dB fidelity, far above the model's
~35 dB GT accuracy).

Procedure: load the shipped ep-100 checkpoint, fine-tune ``steps`` Adam
steps at ``lr`` on scale-2 crop pairs drawn ONLY from the reachable
training split (sorted files [:20] — the held-out gate frames stay
unseen), save to models/FastTransformer/checkpoints_finetune/, then gate
with tools/headline_quality.py --checkpoint_dir on the 34-frame held-out
set.

Usage: python tools/serve_finetune.py [steps] [lr] [crop]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    lr_rate = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-5
    crop = int(sys.argv[3]) if len(sys.argv) > 3 else 192
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from transformerupscaler_tpu.checkpoint import (
        get_latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from transformerupscaler_tpu.train_lib import Trainer

    image_paths = sorted(
        glob.glob("/root/reference/images/training_set/*.png"))[:20]
    assert image_paths, "training images missing"
    rng = np.random.default_rng(0)
    imgs = [np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
            for p in image_paths]
    imgs = [im for im in imgs
            if im.shape[0] >= crop * 2 and im.shape[1] >= crop * 2]
    print(f"{len(imgs)} source images, crop {crop}->{crop * 2}, "
          f"{steps} steps @ lr {lr_rate}", flush=True)

    def sample_pair():
        im = imgs[rng.integers(len(imgs))]
        hc = crop * 2
        y = rng.integers(im.shape[0] - hc + 1)
        x = rng.integers(im.shape[1] - hc + 1)
        hr = im[y:y + hc, x:x + hc]
        from transformerupscaler_tpu.ops.resize import resize
        lr = np.asarray(resize(jnp.asarray(hr)[None], (crop, crop))[0])
        return np.clip(lr, 0.0, 1.0).astype(np.float32), hr

    # Serving-surrogate forward: compose_tails at bf16 (see module docstring).
    tr = Trainer("FastTransformer",
                 checkpoint_dir="models/FastTransformer/checkpoints_finetune",
                 learning_rate=lr_rate, dtype=jnp.bfloat16,
                 compose_tails=True)
    path, ep = get_latest_checkpoint("models/FastTransformer/checkpoints")
    print(f"fine-tuning from {path} (epoch {ep})", flush=True)
    restored = load_checkpoint(path, "FastTransformer")
    tr.params = jax.tree.map(jnp.asarray, restored["params"])
    tr.opt_state = tr.optimizer.init(tr.params)

    key = jax.random.PRNGKey(7)
    for step in range(steps):
        batch = [sample_pair() for _ in range(4)]
        key, sub = jax.random.split(key)
        loss = tr.train_step(batch, sub)
        if step % 20 == 0:
            print(f"step {step}: loss {loss:.5f}", flush=True)
    out = save_checkpoint(tr.checkpoint_dir, ep + 1, tr.params, None)
    print(f"saved {out}", flush=True)
    print("now gate with: python tools/headline_quality.py --images 34 "
          "--checkpoint_dir models/FastTransformer/checkpoints_finetune",
          flush=True)


if __name__ == "__main__":
    main()
