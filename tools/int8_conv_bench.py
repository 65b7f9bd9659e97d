#!/usr/bin/env python
"""Honest (abs-sum probe) op-level numbers for the int8 serving decision.

Probes the 3x3 64->64 conv and the composed tails in bf16-packed vs int8
(dynamic per-tensor act quant vs static precomputed scale), and the patch
embed/unembed GEMMs in bf16 vs int8. See tools/probe_lib.py for why the
abs-sum matters.

Usage: python tools/int8_conv_bench.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from tools.probe_lib import probe


def log(m):
    print(m, flush=True)


def quant_w(k):
    s = jnp.max(jnp.abs(k)) / 127.0
    q = jnp.clip(jnp.round(k / s), -127, 127).astype(jnp.int8)
    return q, s


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    log(f"device: {jax.devices()[0]}")

    feat = jax.random.uniform(key, (1, 720, 1280, 64), dt)
    featp = feat.reshape(1, 720, 640, 128)
    featq = jnp.clip(jnp.round(feat / (1.0 / 127)), -127,
                     127).astype(jnp.int8)
    featqp = featq.reshape(1, 720, 640, 128)
    k2 = jax.random.uniform(key, (3, 3, 64, 64), dt) * 0.1
    b2 = jax.random.uniform(key, (64,), dt)

    def conv(x, k, relu=True, stride=1, pe=None, pad=None):
        kw = k.shape[1]
        p = (k.shape[0] - 1) // 2
        padding = ((p, p), (p, p)) if pad is None else pad
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        kws = {} if pe is None else {"preferred_element_type": pe}
        return lax.conv_general_dilated(x, k, (1, stride), padding,
                                        dimension_numbers=dn, **kws)

    from transformerupscaler_tpu.ops.conv import (
        conv2d_packed_raw,
        conv2d_tail_packed,
        pack_kernel_width2,
        pack_tail_stride4,
    )

    probe("conv3x3 bf16 packed_raw (recheck)",
          lambda pp, v: conv2d_packed_raw(v, k2, b2, relu=True),
          None, featp, K, log=log)

    kq, ks = quant_w(k2)

    def conv_i8_dyn(pp, v):
        xs = jnp.maximum(jnp.max(jnp.abs(v)), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(v / xs), -127, 127).astype(jnp.int8)
        acc = conv(xq, kq, pe=jnp.int32)
        y = acc.astype(jnp.float32) * (xs * ks) + b2.astype(jnp.float32)
        return jnp.maximum(y, 0.0).astype(dt)

    probe("conv3x3 int8 dyn-quant (unpacked)", conv_i8_dyn, None, feat, K,
          log=log)

    def conv_i8_static(pp, v):
        # v already int8 (producer emitted it); epilogue -> bf16 + relu.
        acc = conv(v, kq, pe=jnp.int32)
        y = acc.astype(jnp.float32) * ((1.0 / 127) * ks) + b2.astype(jnp.float32)
        return jnp.maximum(y, 0.0).astype(dt)

    probe("conv3x3 int8 static (int8 in, bf16 out)", conv_i8_static,
          None, featq, K, log=log)

    def conv_i8_static_i8out(pp, v):
        acc = conv(v, kq, pe=jnp.int32)
        y = acc.astype(jnp.float32) * ((1.0 / 127) * ks) + b2.astype(jnp.float32)
        y = jnp.maximum(y, 0.0)
        return jnp.clip(jnp.round(y / (1.0 / 127)), -127, 127).astype(jnp.int8)

    probe("conv3x3 int8 static (int8 in, int8 out)", conv_i8_static_i8out,
          None, featq, K, log=log)

    kqp = pack_kernel_width2(kq.astype(jnp.float32)).astype(jnp.int8)

    def conv_i8_packed(pp, v):
        dn = lax.conv_dimension_numbers(v.shape, kqp.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        acc = lax.conv_general_dilated(v, kqp, (1, 1), ((1, 1), (1, 1)),
                                       dimension_numbers=dn,
                                       preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * ((1.0 / 127) * ks)
        y = y + jnp.tile(b2.astype(jnp.float32), 2)
        return jnp.maximum(y, 0.0).astype(dt)

    probe("conv3x3 int8 static packed", conv_i8_packed, None, featqp, K,
          log=log)

    # Tails
    for kw in (5, 7):
        kt = jax.random.uniform(key, (kw, kw, 64, 12), dt) * 0.1
        bt = jax.random.uniform(key, (12,), dt)
        probe(f"tail {kw}x{kw} bf16 packed (recheck)",
              lambda pp, v, kt=kt, bt=bt: conv2d_tail_packed(
                  v, kt, bt, relu=True),
              None, featp, K, log=log)
        ktq, kts = quant_w(kt)
        ktqp = pack_tail_stride4(ktq.astype(jnp.float32)).astype(jnp.int8)
        pad = (kw - 1) // 2
        boff = (pad + 1) // 2
        pad_r = ktqp.shape[1] - boff - 4

        def tail_i8(pp, v, ktqp=ktqp, kts=kts, bt=bt, pad=pad, boff=boff,
                    pad_r=pad_r):
            dn = lax.conv_dimension_numbers(v.shape, ktqp.shape,
                                            ("NHWC", "HWIO", "NHWC"))
            acc = lax.conv_general_dilated(
                v, ktqp, (1, 4), ((pad, pad), (boff, max(pad_r, 0))),
                dimension_numbers=dn, preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * ((1.0 / 127) * kts)
            y = y + jnp.tile(bt.astype(jnp.float32), 8)
            return jnp.maximum(y, 0.0).astype(dt)

        probe(f"tail {kw}x{kw} int8 static packed", tail_i8, None, featqp, K,
              log=log)

    # Patch embed / unembed (honest re-probe + int8)
    from transformerupscaler_tpu.ops.patch import (
        patch_embed,
        patch_embed_packed,
        patch_unembed,
        patch_unembed_packed,
    )
    ke = jax.random.uniform(key, (8, 8, 64, 192), dt) * 0.05
    be = jnp.zeros((192,), dt)
    ku = jax.random.uniform(key, (192, 8, 8, 64), dt) * 0.05
    bu = jnp.zeros((64,), dt)
    tokens = jax.random.uniform(key, (1, 90, 160, 192), dt)
    probe("patch_embed XLA (honest)",
          lambda pp, v: patch_embed(v, ke, be), None, feat, K, log=log)
    probe("patch_embed packed (honest)",
          lambda pp, v: patch_embed_packed(v, ke, be), None, featp, K,
          log=log)
    probe("patch_unembed XLA (honest)",
          lambda pp, v: patch_unembed(v, ku, bu), None, tokens, K, log=log)
    probe("patch_unembed packed (honest)",
          lambda pp, v: patch_unembed_packed(v, ku, bu), None, tokens, K,
          log=log)

    keq, kes = quant_w(ke.reshape(4096, 192))

    def embed_i8(pp, v):
        b, h, wp2, c2 = v.shape
        ht, wt = h // 8, wp2 // 4
        pt = v.reshape(b, ht, 8, wt, 4, c2).transpose(0, 1, 3, 2, 4, 5)
        pt = pt.reshape(b, ht, wt, 4096)
        xs = jnp.maximum(jnp.max(jnp.abs(pt)), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(pt / xs), -127, 127).astype(jnp.int8)
        acc = jnp.einsum("bhwp,pd->bhwd", xq, keq,
                         preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (xs * kes) + be).astype(dt)

    probe("patch_embed int8 dyn (packed)", embed_i8, None, featp, K, log=log)


if __name__ == "__main__":
    main()
