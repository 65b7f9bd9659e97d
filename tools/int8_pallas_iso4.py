#!/usr/bin/env python
"""Test the de-poisoning fix: XLA DOT-produced values feeding Pallas.

iso3 pinned: XLA *conv-emitter* outputs feeding a pallas_call pay a 3-12 ms
relayout; Pallas-produced and jit-input values are clean. Hypothesis: XLA
dot-produced values are also clean (dots emit default layouts), so the
conv1 producer can be reformulated as im2col+dot and the serving path's
XLA->Pallas crossings all become clean.

Usage: python tools/int8_pallas_iso4.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def conv_packed_dots(xp, kernel, bias=None, relu=False):
    """conv2d_packed_raw as im2col + ONE dot (shifted-slice concat)."""
    from transformerupscaler_tpu.ops.conv import pack_kernel_width2

    b, h, wp2, _ = xp.shape
    kh, kw = kernel.shape[:2]
    pad_h = (kh - 1) // 2
    pad = (kw - 1) // 2
    jmin, jmax = (0 - pad) // 2, (1 + pad) // 2
    kp = pack_kernel_width2(kernel).astype(xp.dtype)
    khp, kwp, c2i, c2o = kp.shape
    xpad = jnp.pad(xp, ((0, 0), (pad_h, pad_h), (-jmin, jmax), (0, 0)))
    cols = [xpad[:, dy:dy + h, j:j + wp2, :]
            for dy in range(khp) for j in range(kwp)]
    im = jnp.concatenate(cols, axis=-1)
    out = jnp.einsum("bhwk,ko->bhwo", im,
                     kp.reshape(khp * kwp * c2i, c2o),
                     preferred_element_type=jnp.float32).astype(xp.dtype)
    if bias is not None:
        out = out + jnp.tile(bias.astype(xp.dtype), 2)
    if relu:
        out = jax.nn.relu(out)
    return out


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    from transformerupscaler_tpu.ops.conv import conv2d_packed_raw
    from transformerupscaler_tpu.ops.pallas.stream import (
        conv3x3_packed_stream,
        deinterleave4,
        embed_stream,
        unembed_combine_stream,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    h, wp2 = 720, 640
    x3 = jax.random.uniform(key, (1, h, wp2, 6), dt)  # packed RGB
    k1 = jax.random.uniform(key, (3, 3, 3, 64), jnp.float32) * 0.05
    b1 = jnp.zeros((64,), jnp.float32)
    ke = jax.random.uniform(key, (8, 8, 64, 192), dt) * 0.05
    be = jnp.zeros((192,), dt)
    ku = jax.random.uniform(key, (192, 8, 8, 64), dt) * 0.05
    bu = jnp.zeros((64,), dt)
    k2 = jax.random.uniform(key, (3, 3, 64, 64), jnp.float32) * 0.05
    b2 = jnp.zeros((64,), jnp.float32)
    print(f"device: {jax.devices()[0]}", flush=True)

    import numpy as np

    # numerics check once (CPU-free: tiny on-device compare)
    ref = conv2d_packed_raw(x3[:, :16], k1.astype(dt), b1, relu=True)
    got = conv_packed_dots(x3[:, :16], k1.astype(dt), b1, relu=True)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"dots-conv parity max err: {err:.2e}", flush=True)

    probe("conv1 XLA conv-emitter alone",
          lambda p, v: conv2d_packed_raw(v, k1.astype(dt), b1, relu=True),
          None, x3, K, log=print)
    probe("conv1 im2col+dot alone",
          lambda p, v: conv_packed_dots(v, k1.astype(dt), b1, relu=True),
          None, x3, K, log=print)
    probe("conv1 dots -> Pallas conv stream",
          lambda p, v: conv3x3_packed_stream(
              conv_packed_dots(v, k1.astype(dt), b1, relu=True),
              k2.astype(dt), b2, relu=True),
          None, x3, K, log=print)
    probe("conv1 conv -> Pallas conv stream (poison ref)",
          lambda p, v: conv3x3_packed_stream(
              conv2d_packed_raw(v, k1.astype(dt), b1, relu=True),
              k2.astype(dt), b2, relu=True),
          None, x3, K, log=print)

    def tokens_from_dot(v):
        # emulate trunk output: plain XLA GEMM producing (1, 90, 160, 192)
        feat = conv_packed_dots(v, k1.astype(dt), b1, relu=True)
        t = embed_stream(deinterleave4(feat), ke, be)
        w = jax.random.uniform(jax.random.PRNGKey(1), (192, 192), dt) * 0.05
        return jnp.einsum("bhwc,cd->bhwd", t, w), deinterleave4(feat)

    probe("XLA dot tokens -> Pallas unembed_combine",
          lambda p, v: unembed_combine_stream(*tokens_from_dot(v), ku, bu),
          None, x3, K, log=print)


if __name__ == "__main__":
    main()
