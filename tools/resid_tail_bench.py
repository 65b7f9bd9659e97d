#!/usr/bin/env python
"""ResidualTransformer packed-path bicubic-tail A/B: conv vs matmul resize.

The block-packed bicubic branches pay MACs ~ r^2 (dense (4,4,C,3r^2 C)
kernels); the separable resize matmuls are O(output area). This probes the
full packed model both ways per scale, one process, chained abs-sum probes.

Usage: python tools/resid_tail_bench.py [K] [scales...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scales = [int(s) for s in sys.argv[2:]] or [3, 6]
    from transformerupscaler_tpu.registry import get_model

    dt = jnp.bfloat16
    kw = dict(dtype=dt, packed_serve=True, pallas_serve=True)
    model = get_model("ResidualTransformer", **kw)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    print(f"device: {jax.devices()[0]}", flush=True)

    for s in scales:
        params = get_model("ResidualTransformer", dtype=dt).init(
            key, x, res_out=(720 * s, 1280 * s))

        def apply(p, v, s=s):
            return model.apply(p, v, upscale_factor=s)

        for mode in ("matmul", "conv"):
            os.environ["TUX_RESID_BICUBIC"] = mode
            per = probe(f"x{s} {mode}", apply, params, x, K, log=None)
            print(f"x{s} bicubic-tail={mode:7s} {per*1e3:8.2f} ms "
                  f"{1.0/per:7.2f} fps", flush=True)


if __name__ == "__main__":
    main()
