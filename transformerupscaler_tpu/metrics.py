"""Image quality metrics: PSNR and SSIM.

Parity: the reference scores with skimage's ``peak_signal_noise_ratio`` and
``structural_similarity(data_range=1, channel_axis=-1)``
(inference.py:136-140); skimage is not in this image, so both are implemented
here with identical defaults (SSIM: 7x7 uniform window, K1=0.01, K2=0.03,
unbiased covariance normalization, per-channel mean).
"""

import numpy as np
from scipy.ndimage import uniform_filter


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10((data_range ** 2) / mse))


def _ssim_single(x: np.ndarray, y: np.ndarray, data_range: float, win_size: int) -> float:
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    ndim = x.ndim
    NP = win_size ** ndim
    cov_norm = NP / (NP - 1)  # unbiased, skimage default

    filt = lambda im: uniform_filter(im, size=win_size, mode="reflect")
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2

    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    # skimage crops the filter boundary (pad = (win_size - 1) // 2) before
    # averaging.
    pad = (win_size - 1) // 2
    sl = tuple(slice(pad, s - pad) for s in S.shape)
    return float(S[sl].mean())


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0,
         channel_axis: int | None = -1, win_size: int = 7) -> float:
    a = np.asarray(a)
    b = np.asarray(b)
    if channel_axis is not None:
        a = np.moveaxis(a, channel_axis, 0)
        b = np.moveaxis(b, channel_axis, 0)
        return float(np.mean([
            _ssim_single(a[c], b[c], data_range, win_size) for c in range(a.shape[0])
        ]))
    return _ssim_single(a, b, data_range, win_size)


def mse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
