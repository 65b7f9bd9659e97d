"""Dataset and bucketing tests."""

import numpy as np
import pytest
from PIL import Image

from transformerupscaler_tpu.data import (
    HighresImageDataset,
    OnlineHighresDataset,
    bucket_batch,
)
from transformerupscaler_tpu.data.bucketing import batched
from transformerupscaler_tpu.resolutions import SCALE_PAIRS


@pytest.fixture
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"image_{i}.png")
    (tmp_path / "ignored.txt").write_text("not an image")
    return str(tmp_path)


def test_local_dataset_len_and_pairs(image_dir):
    ds = HighresImageDataset(image_dir)
    # Reference hardcodes 200 (data_class.py:47-50); we cap to what exists so
    # small directories don't index out of range: 3 images x 10 pairs.
    assert len(ds) == 30
    assert len(ds.image_files) == 3
    # Index 6 is the small 96x96 -> 192x192 pair.
    lr, hr = ds[6]
    assert lr.shape == (96, 96, 3) and hr.shape == (192, 192, 3)
    assert lr.dtype == np.float32
    assert 0.0 <= lr.min() and lr.max() <= 1.0


def test_local_dataset_pair_cycling(image_dir):
    ds = HighresImageDataset(image_dir)
    for pair_idx in (6, 7, 8, 9):
        lr, hr = ds[pair_idx]
        assert lr.shape[:2] == SCALE_PAIRS[pair_idx]["lr"]
        assert hr.shape[:2] == SCALE_PAIRS[pair_idx]["hr"]


def test_online_dataset_injected_fetch():
    img = Image.fromarray(
        (np.random.default_rng(0).random((128, 128, 3)) * 255).astype(np.uint8))
    ds = OnlineHighresDataset(fetch_fn=lambda: img, batch_download_count=2,
                              minimum_cache=1)
    try:
        assert len(ds) == 500  # reference hardcode (data_class.py:144-146)
        # Cycle one image through several scale pairs; eviction after 10 uses.
        lr, hr = ds[0]
        assert lr.shape[:2] == SCALE_PAIRS[0]["lr"]
        lr, hr = ds[1]
        assert lr.shape[:2] == SCALE_PAIRS[1]["lr"]
    finally:
        ds.close()


def test_online_dataset_fallback_dir(image_dir):
    ds = OnlineHighresDataset(fallback_dir=image_dir, batch_download_count=2,
                              minimum_cache=1)
    try:
        lr, hr = ds[0]
        assert lr.shape[:2] == SCALE_PAIRS[0]["lr"]
    finally:
        ds.close()


def test_bucket_batch_groups_by_geometry():
    rng = np.random.default_rng(0)
    mk = lambda h, w: rng.random((h, w, 3)).astype(np.float32)
    samples = [(mk(8, 8), mk(16, 16)), (mk(8, 8), mk(16, 16)),
               (mk(8, 8), mk(24, 24)), (mk(4, 6), mk(8, 12))]
    buckets = bucket_batch(samples)
    assert set(buckets) == {((8, 8), (16, 16)), ((8, 8), (24, 24)), ((4, 6), (8, 12))}
    lrs, hrs = buckets[((8, 8), (16, 16))]
    assert lrs.shape == (2, 8, 8, 3) and hrs.shape == (2, 16, 16, 3)


def test_batched_iteration():
    data = [(np.zeros((2, 2, 3)), np.zeros((4, 4, 3)))] * 7
    batches = list(batched(data, 3))
    assert [len(b) for b in batches] == [3, 3, 1]
    batches = list(batched(data, 3, drop_last=True))
    assert [len(b) for b in batches] == [3, 3]


def test_heldout_manifest_is_untrained():
    """tests/golden/heldout_manifest.txt == sorted(training_set)[20:], and
    the len-200 dataset cap makes those indices unreachable in training
    (tools/eval_frames.py) — the quality gates' held-out claim."""
    import os

    from tools.eval_frames import (
        HELDOUT_START,
        MANIFEST,
        TRAINING_SET,
        heldout_paths,
    )

    with open(MANIFEST) as fh:
        manifest = [l.strip() for l in fh
                    if l.strip() and not l.startswith("#")]
    held = [os.path.basename(p) for p in heldout_paths()]
    assert manifest == held and len(held) > 0

    ds = HighresImageDataset(TRAINING_SET)
    # Training draws indices from arange(len(ds)) only (bucketing.batched):
    # the largest reachable file index stays below the held-out start.
    assert len(ds) == 200
    assert (len(ds) - 1) // len(ds.scale_pairs) < HELDOUT_START
    reachable = {ds.image_files[i // len(ds.scale_pairs)]
                 for i in range(len(ds))}
    assert reachable.isdisjoint(set(heldout_paths()))
