"""Resize parity vs PyTorch ground truth (torch CPU is the oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from transformerupscaler_tpu.ops import (
    interpolate_bicubic,
    resize,
    resize_antialias_bilinear,
)


def _rand_img(rng, h, w, c=3, b=2):
    return rng.random((b, h, w, c), dtype=np.float64).astype(np.float32)


def _to_torch(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def _from_torch(t):
    return t.numpy().transpose(0, 2, 3, 1)


SIZES = [
    ((24, 40), (36, 60)),    # 1.5x up (the 720p->1080p shape class)
    ((24, 40), (48, 80)),    # 2x up
    ((16, 16), (48, 48)),    # 3x up
    ((16, 16), (96, 96)),    # 6x up
    ((48, 80), (36, 60)),    # downscale
    ((31, 53), (47, 29)),    # odd sizes, mixed up/down
    ((20, 20), (20, 20)),    # identity
]


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_bicubic_matches_f_interpolate(rng, in_hw, out_hw):
    x = _rand_img(rng, *in_hw)
    want = _from_torch(
        F.interpolate(_to_torch(x), size=out_hw, mode="bicubic", align_corners=False)
    )
    got = np.asarray(interpolate_bicubic(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_bilinear_antialias_matches_torchvision_resize(rng, in_hw, out_hw):
    x = _rand_img(rng, *in_hw)
    want = _from_torch(
        F.interpolate(_to_torch(x), size=out_hw, mode="bilinear",
                      align_corners=False, antialias=True)
    )
    got = np.asarray(resize_antialias_bilinear(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_bicubic_antialias_matches_torch(rng, in_hw, out_hw):
    x = _rand_img(rng, *in_hw)
    want = _from_torch(
        F.interpolate(_to_torch(x), size=out_hw, mode="bicubic",
                      align_corners=False, antialias=True)
    )
    got = np.asarray(resize(jnp.asarray(x), out_hw, method="bicubic", antialias=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_hwc_input_accepted(rng):
    x = rng.random((24, 40, 3), dtype=np.float64).astype(np.float32)
    out = resize(jnp.asarray(x), (36, 60))
    assert out.shape == (36, 60, 3)


def test_ab_test_height_filter_matches_torchvision(rng):
    """ab_test's res filters must use transforms.Resize float semantics
    (reference ab_test.py:91-105): bilinear+antialias on the float tensor,
    shorter side -> size, NO uint8 round-trip."""
    import ab_test

    x = rng.random((30, 52, 3), dtype=np.float64).astype(np.float32)
    got = ab_test._resize_to_height(x, 21)  # landscape: height is shorter
    want = _from_torch(
        F.interpolate(_to_torch(x[None]), size=(21, 36), mode="bilinear",
                      align_corners=False, antialias=True)
    )[0]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    # Portrait: width is the shorter side; Resize(int) matches it instead.
    xp = rng.random((52, 30, 3), dtype=np.float64).astype(np.float32)
    got_p = ab_test._resize_to_height(xp, 21)
    assert got_p.shape[:2] == (36, 21)


class TestBandedResize:
    """Banded-block decomposition (ops/resize._banded_factors): identical
    weights applied over per-block input windows must match the dense GEMM
    to fp-reassociation tolerance. Shapes here are large enough to trigger
    banding (out >= 2*_MB=256 rows and band < 0.7*in)."""

    def test_banded_matches_dense_resize(self, rng, monkeypatch):
        import jax

        import sys

        rz = sys.modules["transformerupscaler_tpu.ops.resize"]
        x = jnp.asarray(_rand_img(rng, 360, 320, c=3, b=1))
        monkeypatch.setenv("TUX_BANDED_RESIZE", "0")
        dense = np.asarray(rz.resize(x, (540, 480), method="bilinear",
                                     antialias=True))
        monkeypatch.setenv("TUX_BANDED_RESIZE", "1")
        assert rz._banded_factors(360, 540, "bilinear", True, None,
                                  rz._MB) is not None
        banded = np.asarray(rz.resize(x, (540, 480), method="bilinear",
                                      antialias=True))
        np.testing.assert_allclose(banded, dense, atol=2e-5, rtol=1e-5)

    def test_banded_matches_dense_resize_shuffled(self, rng, monkeypatch):
        import jax

        import sys

        from transformerupscaler_tpu.ops.resize import resize_shuffled

        rz = sys.modules["transformerupscaler_tpu.ops.resize"]

        z = jnp.asarray(rng.random((1, 180, 160, 12),
                                   dtype=np.float64).astype(np.float32))
        hi = jax.lax.Precision.HIGHEST
        monkeypatch.setenv("TUX_BANDED_RESIZE", "0")
        dense = np.asarray(resize_shuffled(z, 2, (270, 480), precision=hi))
        monkeypatch.setenv("TUX_BANDED_RESIZE", "1")
        assert rz._banded_factors(180, 270, "bilinear", True, None,
                                  rz._MB, 2) is not None
        banded = np.asarray(resize_shuffled(z, 2, (270, 480), precision=hi))
        np.testing.assert_allclose(banded, dense, atol=2e-5, rtol=1e-5)

    def test_auto_gate_uses_precision(self, monkeypatch):
        import jax

        from transformerupscaler_tpu.ops.resize import _banded_on

        monkeypatch.delenv("TUX_BANDED_RESIZE", raising=False)
        assert not _banded_on(None, jnp.bfloat16)    # bf16 fast path: dense
        assert _banded_on(jax.lax.Precision.HIGH)    # quality squash: banded
        assert _banded_on(None, jnp.float32)         # f32 inputs: banded
        monkeypatch.setenv("TUX_BANDED_RESIZE", "1")
        assert _banded_on(None)
        monkeypatch.setenv("TUX_BANDED_RESIZE", "0")
        assert not _banded_on(jax.lax.Precision.HIGHEST)
