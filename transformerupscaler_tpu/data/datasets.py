"""Datasets: local high-res PNG directory and online streaming download.

Parity: reference data_handling/data_class.py.
  - ``HighresImageDataset`` (:24-77): every image expands into the 10 fixed
    LR->HR scale pairs; ``__len__`` is 200 like the reference's hardcode;
    tensors (here HWC float32 arrays) are asserted into [0, 1].
  - ``OnlineHighresDataset`` (:79-203): a deque cache of 4K images fetched
    from picsum.photos by a background thread + 8-worker batch executor; each
    cached image serves all 10 scale pairs then is evicted; ``__len__`` 500.
    ``fetch_fn`` is injectable (the default hits the network, which a
    zero-egress environment won't allow — tests and offline training inject a
    local loader or use ``fallback_dir``).

TPU-first note: samples are NHWC numpy; batching happens in
``bucketing.bucket_batch`` which groups by geometry so each bucket hits one
jit cache entry instead of the reference's per-sample eager loop
(train.py:119-133).
"""

from __future__ import annotations

import os
import threading
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from io import BytesIO

import numpy as np
from PIL import Image

from transformerupscaler_tpu.resolutions import SCALE_PAIRS


def _resize_pil(img: Image.Image, hw: tuple[int, int],
                uint8: bool = False) -> np.ndarray:
    """PIL bilinear resize to (H, W) -> HWC float32 in [0, 1] (matches
    torchvision transforms.Resize + ToTensor on PIL input).

    ``uint8=True`` returns the raw uint8 pixels instead — numerically
    identical after /255 (PIL resizes in uint8 either way), 4x smaller for
    caching and host->device transfer (the tunneled TPU moves ~17 MB/s, so
    f32 4K batches were costing 30+ s/step).
    """
    h, w = hw
    out = img.resize((w, h), Image.BILINEAR)
    if uint8:
        return np.asarray(out, dtype=np.uint8)
    arr = np.asarray(out, dtype=np.float32) / 255.0
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    return arr


class HighresImageDataset:
    """Local directory of .png images, expanded into the 10 scale pairs."""

    def __init__(self, image_dir: str, length: int = 200, scale_pairs=None,
                 cache: bool = False, uint8: bool = False):
        self.image_dir = image_dir
        self.image_files = sorted(
            os.path.join(image_dir, f)
            for f in os.listdir(image_dir)
            if f.lower().endswith(".png")
        )
        self.scale_pairs = list(scale_pairs if scale_pairs is not None else SCALE_PAIRS)
        self._length = length
        # Optional epoch cache: decoding + Lanczos-resizing a 4K PNG costs
        # seconds on this one-core host and dominates TPU training epochs.
        # The full pair set for the reference training_set is ~10 GB — cheap
        # against host RAM, so train.py turns this on.
        self._cache: dict | None = {} if cache else None
        self._uint8 = uint8

    def __len__(self) -> int:
        # The reference hardcodes 200 (data_class.py:47-50), which indexes out
        # of range when the directory holds fewer than 20 images — cap to what
        # actually exists.
        return min(self._length, len(self.image_files) * len(self.scale_pairs))

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        n = len(self.scale_pairs)
        img_path = self.image_files[idx // n]
        pair = self.scale_pairs[idx % n]
        hr_image = Image.open(img_path).convert("RGB")
        item = (_resize_pil(hr_image, pair["lr"], uint8=self._uint8),
                _resize_pil(hr_image, pair["hr"], uint8=self._uint8))
        if self._cache is not None:
            self._cache[idx] = item
        return item

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def _default_fetch(url: str = "https://picsum.photos/3840/2160"):
    import requests

    try:
        response = requests.get(url, timeout=10)
        response.raise_for_status()
        return Image.open(BytesIO(response.content)).convert("RGB")
    except Exception as e:  # swallow-and-retry, like the reference (:121-123)
        print(f"Error downloading image: {e}")
        return None


class OnlineHighresDataset:
    """Streaming dataset backed by a background-refilled download cache."""

    def __init__(self, fetch_fn=None, fallback_dir: str | None = None,
                 batch_download_count: int = 50, minimum_cache: int = 10,
                 length: int = 500, max_workers: int = 8):
        self.scale_pairs = list(SCALE_PAIRS)
        self.num_scale_pairs = len(self.scale_pairs)
        self.batch_download_count = batch_download_count
        self.minimum_cache = minimum_cache
        self._length = length
        self._max_workers = max_workers

        if fetch_fn is None and fallback_dir is not None:
            files = sorted(
                os.path.join(fallback_dir, f) for f in os.listdir(fallback_dir)
                if f.lower().endswith((".png", ".jpg")))
            counter = {"i": 0}

            def fetch_fn():
                path = files[counter["i"] % len(files)]
                counter["i"] += 1
                return Image.open(path).convert("RGB")

        self.fetch_fn = fetch_fn or _default_fetch
        self.cache: deque = deque()
        self.lock = threading.Lock()
        self.stop_event = threading.Event()
        self.thread = threading.Thread(target=self._download_loop, daemon=True)
        self.thread.start()

    def _download_batch(self):
        with ThreadPoolExecutor(max_workers=self._max_workers) as ex:
            for img in ex.map(lambda _: self.fetch_fn(),
                              range(self.batch_download_count)):
                if img is not None:
                    with self.lock:
                        self.cache.append((img, 0))

    def _download_loop(self):
        while not self.stop_event.is_set():
            with self.lock:
                n = len(self.cache)
            if n < self.minimum_cache:
                self._download_batch()
            else:
                time.sleep(0.1)

    def __len__(self) -> int:
        return self._length

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        while True:
            with self.lock:
                if self.cache:
                    img, used = self.cache[0]
                    break
            time.sleep(0.05)
        pair = self.scale_pairs[used]
        lr = _resize_pil(img, pair["lr"])
        hr = _resize_pil(img, pair["hr"])
        with self.lock:
            used += 1
            if used >= self.num_scale_pairs:
                self.cache.popleft()
            else:
                self.cache[0] = (img, used)
        return lr, hr

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def close(self):
        self.stop_event.set()
        if self.thread.is_alive():
            self.thread.join(timeout=5)

    def __del__(self):
        try:
            self.stop_event.set()
        except Exception:
            pass
