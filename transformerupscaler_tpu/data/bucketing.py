"""Geometry bucketing: group variable-size (lr, hr) samples by shape.

The reference trains per-sample because its batches mix the 10 LR->HR
geometries (train.py:32-38,119-133 — the collate returns lists). On TPU,
every geometry is its own compiled program, so we instead group a batch's
samples by (lr_hw, hr_hw): each bucket stacks into one NHWC array and runs
one batched forward, hitting a bounded jit cache (at most 10 geometries —
data_class.py:34-45).
"""

from collections import defaultdict

import numpy as np


def bucket_batch(samples):
    """samples: iterable of (lr HWC, hr HWC) -> dict mapping
    ((lr_h, lr_w), (hr_h, hr_w)) -> (lr NHWC, hr NHWC) stacked arrays."""
    groups = defaultdict(list)
    for lr, hr in samples:
        groups[(tuple(lr.shape[:2]), tuple(hr.shape[:2]))].append((lr, hr))
    out = {}
    for key, pairs in groups.items():
        if isinstance(pairs[0][0], np.ndarray):
            xp = np
        else:
            # device-resident samples (train_lib._DeviceCachedDataset):
            # stack on device — np.stack would silently pull them to host.
            import jax.numpy as jnp
            xp = jnp
        lrs = xp.stack([p[0] for p in pairs])
        hrs = xp.stack([p[1] for p in pairs])
        out[key] = (lrs, hrs)
    return out


def batched(dataset, batch_size: int, shuffle: bool = False, seed: int = 0,
            drop_last: bool = False):
    """Yield lists of samples of length ``batch_size`` from ``dataset``."""
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    batch = []
    for i in idx:
        batch.append(dataset[int(i)])
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch and not drop_last:
        yield batch


def prefetched(iterator, depth: int = 2):
    """Run ``iterator`` in a background thread, keeping up to ``depth`` items
    ready — overlaps host-side decode/resize with device steps (the TPU
    analogue of the reference's DataLoader worker processes,
    train.py:80-81)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
