#!/usr/bin/env python
"""Pin the trunk's in-model vs op-level gap (~2.85 vs ~2.1 ms at 720p).

The op-level probe feeds (240, 64, 192) windows directly; in-model the
trunk sits between window_partition and window_reverse (XLA relayouts of
the (1, 90, 160, 192) token grid, plus the 90 -> 96 grid pad). This
probes, in ONE process:

  kernel      fused_window_trunk_v2 on pre-windowed input (control)
  partition   window_partition + reshape alone (no trunk)
  wrapped     run_window_trunk on the token grid (pad+partition+trunk+rev)

Usage: python tools/trunk_gap_bench.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from transformerupscaler_tpu.models.common import (
        WindowBlock,
        window_partition,
        window_reverse,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    heads, ws, d, layers = 12, 8, 192, 6
    blocks = [WindowBlock(d, ws, heads, dropout=0.0, dtype=dt,
                          impl="fused2") for _ in range(layers)]
    tokens = jax.random.uniform(key, (1, 90, 160, d), dt)
    win240 = jax.random.uniform(key, (240, ws * ws, d), dt)
    params = [blk.init(jax.random.PRNGKey(i), win240)["params"]
              for i, blk in enumerate(blocks)]
    print(f"device: {jax.devices()[0]}", flush=True)

    from transformerupscaler_tpu.ops.pallas.trunk2 import (
        fused_window_trunk_v2,
    )

    probe("kernel only (240 windows)",
          lambda p, w: fused_window_trunk_v2(w, params, heads, ws),
          None, win240, K, log=print)

    def part_only(p, t):
        tp = jnp.pad(t, ((0, 0), (0, 6), (0, 0), (0, 0)))
        w = window_partition(tp, ws).reshape(240, ws * ws, d)
        # reverse immediately: round-trip cost without the trunk
        w4 = w.reshape(1, 240, ws * ws, d)
        back = window_reverse(w4, ws, 96, 160)
        return back[:, :90]

    probe("partition+reverse round-trip (no trunk)", part_only, None,
          tokens, K, log=print)

    def wrapped(p, t):
        # Inline of models/common.run_window_trunk's fused2 route (the
        # Flax-bound module access doesn't work standalone).
        tp = jnp.pad(t, ((0, 0), (0, 6), (0, 0), (0, 0)))
        w = window_partition(tp, ws).reshape(240, ws * ws, d)
        w = fused_window_trunk_v2(w, params, heads, ws)
        back = window_reverse(w.reshape(1, 240, ws * ws, d), ws, 96, 160)
        return back[:, :90]

    probe("pad+partition+trunk+reverse (in-model form)", wrapped, None,
          tokens, K, log=print)


if __name__ == "__main__":
    main()
