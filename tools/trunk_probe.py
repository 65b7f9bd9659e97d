#!/usr/bin/env python
"""Honest (abs-sum probe) trunk decomposition at the serving geometry:
where do the window-trunk's ~2.5 ms actually go?

Probes the full 6-block trunk, a blocks-with-identity-attention variant,
a blocks-with-identity-MLP variant, one attention layer alone, and the
fused Pallas trunk megakernel — all on (225 windows x 64 tokens x 192).

Usage: python tools/trunk_probe.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def log(m):
    print(m, flush=True)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from transformerupscaler_tpu.registry import get_model
    from transformerupscaler_tpu.models.common import run_window_trunk
    from transformerupscaler_tpu.ops.attention import window_attention

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    tokens = jax.random.uniform(key, (1, 90, 160, 192), dt)
    win = jax.random.uniform(key, (225, 64, 192), dt)
    log(f"device: {jax.devices()[0]}")

    m = get_model("FastTransformer", dtype=dt)
    params = m.init(key, x, res_out=(1080, 1920))
    b = m.bind(params)
    blocks = b.blocks
    p0 = blocks[0].variables["params"]

    probe("trunk 6 blocks (XLA)",
          lambda pp, v: run_window_trunk(v, blocks, 8), params, tokens, K,
          log=log)

    mf = get_model("FastTransformer", dtype=dt, attn_impl="fused")
    bf = mf.bind(params)
    probe("trunk 6 blocks (fused Pallas megakernel)",
          lambda pp, v: run_window_trunk(v, bf.blocks, 8), params, tokens, K,
          log=log)

    ap = p0["attn"]

    def one_attn(pp, v):
        return window_attention(
            v, ap["qkv_kernel"].astype(dt), ap["qkv_bias"],
            ap["proj_kernel"].astype(dt), ap["proj_bias"], ap["bias_table"],
            num_heads=12, window_size=8)

    probe("one window-attention layer (XLA)", one_attn, None, win, K, log=log)

    def one_attn_pallas(pp, v):
        return window_attention(
            v, ap["qkv_kernel"].astype(dt), ap["qkv_bias"],
            ap["proj_kernel"].astype(dt), ap["proj_bias"], ap["bias_table"],
            num_heads=12, window_size=8, impl="pallas")

    probe("one window-attention layer (Pallas)", one_attn_pallas, None, win,
          K, log=log)

    def one_mlp(pp, v):
        z = jax.nn.gelu(
            jnp.einsum("...c,cd->...d", v, p0["mlp_fc1"]["kernel"].astype(dt))
            + p0["mlp_fc1"]["bias"].astype(dt), approximate=False)
        return (jnp.einsum("...c,cd->...d", z,
                           p0["mlp_fc2"]["kernel"].astype(dt))
                + p0["mlp_fc2"]["bias"].astype(dt))

    probe("one MLP (fc1+gelu+fc2, XLA)", one_mlp, None, win, K, log=log)

    import flax.linen as nn
    ln = nn.LayerNorm(epsilon=1e-5, dtype=dt)
    lnp = ln.init(key, win)
    probe("one LayerNorm", lambda pp, v: ln.apply(lnp, v), None, win, K,
          log=log)


if __name__ == "__main__":
    main()
