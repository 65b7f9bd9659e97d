"""Training loop tests: loss decreases, bucketing handles mixed geometries,
resume semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from transformerupscaler_tpu.checkpoint import get_latest_checkpoint
from transformerupscaler_tpu.train_lib import Trainer


class _TinyDataset:
    """Fixed synthetic LR/HR pairs across two geometries."""

    def __init__(self, n=12, seed=0):
        rng = np.random.default_rng(seed)
        self.samples = []
        for i in range(n):
            if i % 3 == 2:
                lr_hw, hr_hw = (16, 16), (32, 32)
            else:
                lr_hw, hr_hw = (32, 32), (64, 64)
            hr = rng.random((*hr_hw, 3)).astype(np.float32)
            # LR = mean-pooled HR (a learnable relationship).
            lr = hr.reshape(lr_hw[0], 2, lr_hw[1], 2, 3).mean(axis=(1, 3))
            self.samples.append((lr, hr))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_training_reduces_loss(tmp_path):
    ds = _TinyDataset()
    trainer = Trainer("WindowTransformer", checkpoint_dir=str(tmp_path),
                      learning_rate=1e-3, dtype=jnp.float32)
    losses = trainer.fit(ds, epochs=4, batch_size=6, log_interval=100,
                         checkpoint_interval=10, resume=False)
    assert len(losses) == 4
    assert losses[-1] < losses[0]


def test_checkpoint_and_resume(tmp_path):
    ds = _TinyDataset(n=6)
    trainer = Trainer("WindowTransformer", checkpoint_dir=str(tmp_path),
                      dtype=jnp.float32)
    trainer.fit(ds, epochs=2, batch_size=6, log_interval=100,
                checkpoint_interval=1, resume=False)
    path, epoch = get_latest_checkpoint(str(tmp_path))
    assert epoch == 2

    # Resume: picks up at epoch 2, trains to 3.
    trainer2 = Trainer("WindowTransformer", checkpoint_dir=str(tmp_path),
                       dtype=jnp.float32)
    trainer2.fit(ds, epochs=3, batch_size=6, log_interval=100,
                 checkpoint_interval=1, resume=True)
    _, epoch = get_latest_checkpoint(str(tmp_path))
    assert epoch == 3

    # Refusing to train past the checkpoint (reference train.py:92-94).
    trainer3 = Trainer("WindowTransformer", checkpoint_dir=str(tmp_path),
                       dtype=jnp.float32)
    with pytest.raises(SystemExit):
        trainer3.fit(ds, epochs=3, batch_size=6, resume=True)


def test_bucketed_step_matches_per_sample_semantics(tmp_path):
    """Batch loss must equal the mean of per-sample L1 losses regardless of
    bucket packing (reference train.py:136)."""
    import jax

    ds = _TinyDataset(n=6)
    trainer = Trainer("WindowTransformer", checkpoint_dir=str(tmp_path),
                      dtype=jnp.float32)
    samples = [ds[i] for i in range(6)]
    trainer.init_params(samples[0][0].shape[:2], samples[0][1].shape[:2])
    # The update donates param buffers — copy to host before stepping.
    params_before = jax.tree.map(lambda x: np.array(x), trainer.params)

    loss = trainer.train_step(samples, jax.random.PRNGKey(0))
    manual = []
    for lr, hr in samples:
        out = trainer.model.apply({"params": params_before}, lr[None],
                                  res_out=hr.shape[:2], require_ratio=False,
                                  deterministic=True)
        manual.append(float(np.mean(np.abs(np.asarray(out[0]) - hr))))
    # Dropout (rate 0.01) makes this approximate.
    assert abs(loss - np.mean(manual)) < 0.02


def test_bucketed_step_exact_without_dropout(tmp_path):
    """With dropout disabled the bucketed batched loss must equal the exact
    per-sample mean (tightened from the 0.02 dropout-excused bound)."""
    import jax

    ds = _TinyDataset(n=5)
    trainer = Trainer("WindowTransformer", checkpoint_dir=str(tmp_path),
                      dtype=jnp.float32, dropout=0.0)
    samples = [ds[i] for i in range(5)]
    trainer.init_params(samples[0][0].shape[:2], samples[0][1].shape[:2])
    params_before = jax.tree.map(lambda x: np.array(x), trainer.params)

    loss = trainer.train_step(samples, jax.random.PRNGKey(0))
    manual = []
    for lr, hr in samples:
        out = trainer.model.apply({"params": params_before}, lr[None],
                                  res_out=hr.shape[:2], require_ratio=False,
                                  deterministic=True)
        manual.append(float(np.mean(np.abs(np.asarray(out[0]) - hr))))
    assert abs(loss - np.mean(manual)) < 1e-6


def test_uint8_device_cache_matches_f32(tmp_path):
    """uint8 samples + device-resident cache must produce the same losses as
    f32 host samples (pixels are uint8-exact either way)."""
    import jax.numpy as jnp
    from PIL import Image
    from transformerupscaler_tpu.data.datasets import HighresImageDataset
    from transformerupscaler_tpu.train_lib import Trainer

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")
    pairs = [{"lr": (16, 16), "hr": (32, 32)}]

    losses = []
    for uint8, cache in ((False, False), (True, True)):
        ds = HighresImageDataset(str(img_dir), scale_pairs=pairs,
                                 uint8=uint8)
        tr = Trainer("FastTransformer",
                     checkpoint_dir=str(tmp_path / f"ck{uint8}"),
                     dtype=jnp.float32)
        ls = tr.fit(ds, epochs=1, batch_size=2, resume=False,
                    device_cache=cache)
        losses.append(ls[0])
    assert abs(losses[0] - losses[1]) < 1e-6, losses
