#!/usr/bin/env python
"""Host<->device transfer bandwidth through the tunneled PJRT backend.

Quantifies the end-to-end streaming gap (tools/stream_e2e_bench.py): the
product pipeline's H2D (720p uint8 frame, 2.7 MB) and D2H (1080p uint8
output, 6.2 MB) ride the tunnel RPC, so sustained streaming fps is bounded
by tunnel bandwidth, not device compute. On local TPU hosts (PCIe) the
same transfers are >10 GB/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")
    one = jax.device_put(np.zeros((8, 128), np.float32), dev)
    np.asarray(one)  # warm the path

    for mb in (0.25, 1.0, 2.7, 6.2):
        n = int(mb * 1e6)
        x = np.random.default_rng(0).integers(0, 256, n, dtype=np.uint8)
        # H2D
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            d = jax.device_put(x, dev)
            d.block_until_ready()
            ts.append(time.perf_counter() - t0)
        h2d = min(ts)
        # D2H: the array must be COMPUTED on device — fetching a buffer
        # that was just uploaded is served from the host-side copy.
        f = jax.jit(lambda v, s: v + s)
        ts = []
        for i in range(4):
            y = f(d, np.uint8(i))
            y.block_until_ready()
            t0 = time.perf_counter()
            _ = np.asarray(y)
            ts.append(time.perf_counter() - t0)
        d2h = min(ts)
        print(f"{mb:5.2f} MB: H2D {h2d*1e3:8.1f} ms ({mb/h2d:7.1f} MB/s)   "
              f"D2H {d2h*1e3:8.1f} ms ({mb/d2h:7.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
