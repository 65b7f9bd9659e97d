#!/usr/bin/env python
"""Banded-block resize A/B at the headline geometry (verdict r3 #2 headroom).

The dense squash GEMMs contract the FULL input axis (23.9 + 31.9 GF at the
headline 1440x1280 -> 1080x1920 packed squash) where the resampling band
carries only ~4-6 taps per output. TUX_BANDED_RESIZE=1 slices the same
matrices into 128-row output blocks contracting only their input window
(ops/resize.py _banded_factors).

Probes (chained abs-sum, tools/probe_lib):
  squash    resize_shuffled headline shape, bf16 + f32 HIGHEST, banded 0/1
  model     full FastTransformer apply, headline + serve_quality, banded 0/1

Usage: python tools/banded_bench.py [K] [squash|model ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    which = set(sys.argv[2:]) or {"squash", "model"}
    from transformerupscaler_tpu.registry import get_model
    from transformerupscaler_tpu.ops.resize import resize_shuffled

    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    if "squash" in which:
        z_b = jax.random.uniform(key, (1, 720, 640, 12), jnp.bfloat16)
        z_f = z_b.astype(jnp.float32)
        for banded in ("0", "1"):
            os.environ["TUX_BANDED_RESIZE"] = banded
            probe(f"squash bf16 banded={banded}", lambda p, v: resize_shuffled(
                v, 2, res_out), {}, z_b, K, log=print)
            probe(f"squash f32 HIGHEST banded={banded}",
                  lambda p, v: resize_shuffled(
                      v, 2, res_out, precision=jax.lax.Precision.HIGHEST),
                  {}, z_f, K, log=print)

    if "model" in which:
        xb = jax.random.uniform(key, (1, 720, 1280, 3), jnp.bfloat16)
        xf = xb.astype(jnp.float32)
        base = get_model("FastTransformer", dtype=jnp.bfloat16,
                         compose_tails=True)
        params = base.init(key, xb, res_out=res_out)
        for banded in ("0", "1"):
            os.environ["TUX_BANDED_RESIZE"] = banded
            for name, x, kw in (
                    ("headline", xb, {}),
                    ("serve_quality", xf, {"serve_quality": True})):
                m = get_model("FastTransformer", dtype=jnp.bfloat16,
                              compose_tails=True, pallas_serve=True,
                              attn_impl="fused2", **kw)
                per = probe(f"{name} banded={banded}",
                            lambda p, v, mm=m: mm.apply(p, v, res_out=res_out),
                            params, x, K, log=print)
                print(f"    -> {1.0 / per:8.2f} fps", flush=True)


if __name__ == "__main__":
    main()
