"""PSNR/SSIM metric tests (skimage-default semantics, implemented locally)."""

import numpy as np

from transformerupscaler_tpu.metrics import mse, psnr, ssim


def test_psnr_identical_inf():
    x = np.random.default_rng(0).random((32, 32, 3))
    assert psnr(x, x) == float("inf")


def test_psnr_known_value():
    a = np.zeros((16, 16))
    b = np.full((16, 16), 0.1)
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20 dB
    assert abs(psnr(a, b, data_range=1.0) - 20.0) < 1e-9


def test_ssim_identical_is_one():
    x = np.random.default_rng(0).random((40, 40, 3))
    assert abs(ssim(x, x) - 1.0) < 1e-9


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(0)
    x = rng.random((64, 64, 3))
    light = np.clip(x + rng.normal(0, 0.02, x.shape), 0, 1)
    heavy = np.clip(x + rng.normal(0, 0.3, x.shape), 0, 1)
    s_light, s_heavy = ssim(x, light), ssim(x, heavy)
    assert 1.0 > s_light > s_heavy


def test_ssim_independent_noise_near_zero():
    rng = np.random.default_rng(0)
    a, b = rng.random((64, 64)), rng.random((64, 64))
    assert abs(ssim(a, b, channel_axis=None)) < 0.1


def test_ssim_grayscale_vs_channelwise():
    x = np.random.default_rng(1).random((32, 32))
    x3 = np.stack([x, x, x], axis=-1)
    assert abs(ssim(x3, x3 * 0.9) - ssim(x, x * 0.9, channel_axis=None)) < 1e-9


def test_mse():
    assert mse(np.zeros(4), np.full(4, 2.0)) == 4.0
