"""Native C++ resize library: PIL-parity and fallback behavior."""

import numpy as np
import pytest
from PIL import Image

from transformerupscaler_tpu import native


@pytest.fixture
def src(rng):
    return (rng.random((240, 320, 3)) * 255).astype(np.uint8)


def test_resize_matches_pil_within_rounding(src):
    out = native.resize_bilinear_u8(src, (120, 160))
    want = np.asarray(Image.fromarray(src).resize((160, 120), Image.BILINEAR))
    assert out.shape == (120, 160, 3)
    # Same separable antialias math; only the final rounding may differ.
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_upscale_matches_pil(src):
    out = native.resize_bilinear_u8(src, (480, 640))
    want = np.asarray(Image.fromarray(src).resize((640, 480), Image.BILINEAR))
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_f32_model_input_path(src):
    out = native.resize_to_model_input(src, (120, 160))
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    u8 = native.resize_bilinear_u8(src, (120, 160))
    np.testing.assert_allclose(out * 255.0, u8.astype(np.float32), atol=1.0)


def test_fallback_without_library(src, monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    out = native.resize_bilinear_u8(src, (60, 80))
    assert out.shape == (60, 80, 3)
