"""Checkpoint save/load/discovery tests."""

import numpy as np
import pytest

from transformerupscaler_tpu.checkpoint import (
    default_checkpoint_dir,
    get_latest_checkpoint,
    load_checkpoint,
    param_count,
    save_checkpoint,
)


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "conv1": {"kernel": rng.standard_normal((3, 3, 3, 8)).astype(np.float32),
                  "bias": rng.standard_normal((8,)).astype(np.float32)},
        "blocks_0": {"attn": {"qkv_kernel": rng.standard_normal((8, 24)).astype(np.float32)}},
    }


def test_roundtrip(tmp_path):
    params = _tree()
    path = save_checkpoint(str(tmp_path), 3, params)
    assert path.endswith("model_epoch_3")
    restored = load_checkpoint(path)
    for (ka, a), (kb, b) in zip(
        sorted([("conv1/kernel", params["conv1"]["kernel"])]),
        sorted([("conv1/kernel", restored["params"]["conv1"]["kernel"])]),
    ):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_latest_discovery(tmp_path):
    for epoch in (1, 5, 12):
        save_checkpoint(str(tmp_path), epoch, _tree(epoch))
    # A legacy torch file name also participates in discovery.
    (tmp_path / "model_epoch_20.pth").write_bytes(b"stub")
    path, epoch = get_latest_checkpoint(str(tmp_path))
    assert epoch == 20 and path.endswith("model_epoch_20.pth")
    (tmp_path / "model_epoch_20.pth").unlink()
    path, epoch = get_latest_checkpoint(str(tmp_path))
    assert epoch == 12 and path.endswith("model_epoch_12")


def test_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        get_latest_checkpoint(str(tmp_path))


def test_opt_state_roundtrip(tmp_path):
    params = _tree()
    opt = {"mu": {"conv1": {"kernel": np.ones((3, 3, 3, 8), np.float32)}}}
    path = save_checkpoint(str(tmp_path), 1, params, opt_state=opt)
    restored = load_checkpoint(path)
    assert "opt_state" in restored
    np.testing.assert_array_equal(
        np.asarray(restored["opt_state"]["mu"]["conv1"]["kernel"]),
        opt["mu"]["conv1"]["kernel"])


def test_param_count():
    assert param_count(_tree()) == 3 * 3 * 3 * 8 + 8 + 8 * 24


def test_default_dir_layout():
    assert default_checkpoint_dir("FastTransformer") == "./models/FastTransformer/checkpoints"
