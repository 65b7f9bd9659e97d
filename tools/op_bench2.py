#!/usr/bin/env python
"""Second-wave device probes: small-channel convs + conv formulation variants."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.op_bench import probe


def main():
    from transformerupscaler_tpu.ops.conv import conv2d

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def k(shape):
        return jax.random.normal(key, shape, dt) * 0.05

    feat720 = jnp.zeros((1, 720, 1280, 64), dt)
    feat1440 = jnp.zeros((1, 1440, 2560, 64), dt)
    rgb720 = jnp.zeros((1, 720, 1280, 3), dt)
    rgb1440 = jnp.zeros((1, 1440, 2560, 3), dt)

    w64_3 = k((3, 3, 64, 3))
    w3_12 = k((3, 3, 3, 12))
    w3_3 = k((3, 3, 3, 3))
    w64_64 = k((3, 3, 64, 64))

    P = {}
    probe("decoder_conv2 64->3 @720p", lambda p, v: conv2d(v, w64_3), P, feat720)
    probe("up1_conv 64->3 @1440p", lambda p, v: conv2d(v, w64_3), P, feat1440)
    probe("final_up conv 3->12 @720p", lambda p, v: conv2d(v, w3_12), P, rgb720)
    probe("final_up_conv 3->3 @1440p", lambda p, v: conv2d(v, w3_3), P, rgb1440)

    # conv formulation variants for the 64->64 workhorse
    from jax import lax

    def conv_bf16acc(p, v):
        dn = lax.conv_dimension_numbers(v.shape, w64_64.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(v, w64_64, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=dn)

    probe("conv64->64 bf16 accum", conv_bf16acc, P, feat720)

    def conv_im2col(p, v):
        # 9 shifted views -> one (HW, 576) x (576, 64) GEMM
        b, h, w_, c = v.shape
        pad = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [pad[:, dy:dy + h, dx:dx + w_, :] for dy in range(3) for dx in range(3)]
        stacked = jnp.concatenate(cols, axis=-1)  # (B,H,W,576)
        wmat = w64_64.transpose(0, 1, 2, 3).reshape(576, 64)
        return jnp.einsum("bhwp,pd->bhwd", stacked, wmat,
                          preferred_element_type=jnp.float32).astype(dt)

    probe("conv64->64 im2col einsum", conv_im2col, P, feat720)

    feat128 = jnp.zeros((1, 720, 1280, 128), dt)
    w128 = k((3, 3, 128, 128))
    probe("conv128->128 @720p", lambda p, v: conv2d(v, w128), P, feat128)

    # batched windows attention core alone: (240,64,192) x per-head
    from transformerupscaler_tpu.ops.attention import window_attention
    xw = jnp.zeros((240, 64, 192), dt)
    qkv_w, qkv_b = k((192, 576)), jnp.zeros((576,), dt)
    proj_w, proj_b = k((192, 192)), jnp.zeros((192,), dt)
    table = jnp.zeros((225, 12), jnp.float32)
    probe("window attention (240w,12h)",
          lambda p, v: window_attention(v, qkv_w, qkv_b, proj_w, proj_b, table,
                                        12, 8), P, xw)


if __name__ == "__main__":
    main()
