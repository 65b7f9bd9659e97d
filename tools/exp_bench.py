#!/usr/bin/env python
"""Round-2 reformulation experiments on the real TPU.

Measures the XLA-level restructurings that attack the round-1 stage
breakdown (tools/stage_bench.py):
  - fused phase-split resize in the r^2-packed domain (vs 8.9 ms squash)
  - macro convs for small-output-channel convs (branch A 5x5 64->12, the
    decoder 64->3, the B tail 5x5 3->12)
  - conv vs reshape-GEMM patch embed/unembed
  - width-2-packed 64->64 conv

Chained full-sum probes (see tools/op_bench.py). Usage: exp_bench.py [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chained(apply_fn, M):
    def fn(x):
        def body(i, carry):
            y = apply_fn(carry)
            s = jnp.sum(y.astype(jnp.float32))
            return carry * (1.0 + 0.0 * s.astype(carry.dtype))
        return jnp.ravel(lax.fori_loop(0, M, body, x))[0]
    return jax.jit(fn)


def probe(name, apply_fn, x, K=8):
    f1, fK = chained(apply_fn, 1), chained(apply_fn, K)
    _ = np.asarray(f1(x))
    _ = np.asarray(fK(x))
    t1, tK = timed(f1, x), timed(fK, x)
    per = (tK - t1) / (K - 1)
    print(f"{name:46s} {per * 1e3:8.3f} ms", flush=True)
    return per


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from transformerupscaler_tpu.ops.conv import conv2d, conv2d_macro
    from transformerupscaler_tpu.ops.patch import patch_embed, patch_unembed
    from transformerupscaler_tpu.ops.pixel_shuffle import pixel_shuffle
    from transformerupscaler_tpu.ops.resize import (
        resize_antialias_bilinear,
        resize_shuffled,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)
    feat = jax.random.uniform(ks[0], (1, 720, 1280, 64), dt)
    a12 = jax.random.uniform(ks[1], (1, 720, 1280, 12), dt)
    b12 = jax.random.uniform(ks[2], (1, 720, 1280, 12), dt)
    tokens = jax.random.uniform(ks[3], (1, 90, 160, 192), dt)
    rgb = jax.random.uniform(ks[4], (1, 720, 1280, 3), dt)

    k5_64_12 = jax.random.normal(ks[5], (5, 5, 64, 12), dt) * 0.05
    k3_64_64 = jax.random.normal(ks[6], (3, 3, 64, 64), dt) * 0.05
    k3_64_3 = jax.random.normal(ks[7], (3, 3, 64, 3), dt) * 0.05
    k5_3_12 = jax.random.normal(ks[8], (5, 5, 3, 12), dt) * 0.05
    k3_64_256 = jax.random.normal(ks[9], (3, 3, 64, 256), dt) * 0.05
    ke = jax.random.normal(ks[10], (8, 8, 64, 192), dt) * 0.05
    ku = jax.random.normal(ks[11], (192, 8, 8, 64), dt) * 0.05

    print(f"device: {jax.devices()[0]}", flush=True)

    # --- the squash tail ---
    probe("tail CURRENT shuffle+shuffle+add+resize+clip",
          lambda v: jnp.clip(resize_antialias_bilinear(
              pixel_shuffle(v, 2) + pixel_shuffle(b12, 2), (1080, 1920)),
              0, 1), a12, K)
    probe("tail FUSED add12+resize_shuffled+clip",
          lambda v: jnp.clip(resize_shuffled(v + b12, 2, (1080, 1920)),
                             0, 1), a12, K)

    # --- branch A composed conv (5x5 64->12) ---
    probe("branchA conv2d 5x5 64->12 (current)",
          lambda v: conv2d(v, k5_64_12, None, padding=2, relu=True), feat, K)
    probe("branchA macro block=8 (96 ch)",
          lambda v: conv2d_macro(v, k5_64_12, None, padding=2, relu=True,
                                 block=8), feat, K)
    probe("branchA macro block=10 (120 ch)",
          lambda v: conv2d_macro(v, k5_64_12, None, padding=2, relu=True,
                                 block=10), feat, K)
    probe("upconv 3x3 64->256 (unfused alt)",
          lambda v: conv2d(v, k3_64_256, None, padding=1), feat, K)

    # --- decoder tail ---
    probe("decoder_conv2 3x3 64->3 (current)",
          lambda v: conv2d(v, k3_64_3, None, padding=1), feat, K)
    probe("decoder_conv2 macro block=40 (120 ch)",
          lambda v: conv2d_macro(v, k3_64_3, None, padding=1, block=40),
          feat, K)
    probe("B-tail 5x5 3->12 (current)",
          lambda v: conv2d(v, k5_3_12, None, padding=2), rgb, K)
    probe("B-tail macro block=8",
          lambda v: conv2d_macro(v, k5_3_12, None, padding=2, block=8),
          rgb, K)

    # --- patch embed / unembed ---
    probe("patch_embed reshape-GEMM (current)",
          lambda v: patch_embed(v, ke, None), feat, K)
    dn = lax.conv_dimension_numbers((1, 720, 1280, 64), (8, 8, 64, 192),
                                    ("NHWC", "HWIO", "NHWC"))
    probe("patch_embed lax.conv k8 s8",
          lambda v: lax.conv_general_dilated(
              v, ke, (8, 8), ((0, 0), (0, 0)), dimension_numbers=dn
          ).astype(dt), feat, K)
    probe("patch_unembed GEMM+reshape (current)",
          lambda v: patch_unembed(v, ku, None), tokens, K)
    kt = ku.transpose(1, 2, 0, 3)  # (8, 8, 192, 64) HWIO for transpose conv
    dnu = lax.conv_dimension_numbers((1, 90, 160, 192), (8, 8, 192, 64),
                                     ("NHWC", "HWIO", "NHWC"))
    probe("patch_unembed lax.conv_transpose k8 s8",
          lambda v: lax.conv_transpose(
              v, kt, (8, 8), "VALID", dimension_numbers=dnu).astype(dt),
          tokens, K)

    # --- 64->64 conv: plain vs width-2-packed ---
    probe("conv 3x3 64->64 (current)",
          lambda v: conv2d(v, k3_64_64, None, padding=1), feat, K)

    kp = np.zeros((3, 3, 128, 128), np.float32)
    kn = np.asarray(k3_64_64, np.float32)
    for Xp in range(3):
        for pxi in range(2):
            for pxo in range(2):
                dx = 2 * Xp - 1 + pxi - pxo
                if 0 <= dx <= 2:
                    kp[:, Xp, pxi * 64:(pxi + 1) * 64,
                       pxo * 64:(pxo + 1) * 64] = kn[:, dx]
    kp = jnp.asarray(kp, dt)
    dnp_ = lax.conv_dimension_numbers((1, 720, 640, 128), (3, 3, 128, 128),
                                      ("NHWC", "HWIO", "NHWC"))

    def packed_conv(v):
        vp = v.reshape(1, 720, 640, 128)
        out = lax.conv_general_dilated(
            vp, kp, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dnp_
        ).astype(dt)
        return out.reshape(1, 720, 1280, 64)

    probe("conv 3x3 64->64 width-2-packed", packed_conv, feat, K)

    # correctness spot-check for the packed conv
    ref = conv2d(feat, k3_64_64, None, padding=1)
    got = packed_conv(feat)
    print("packed conv maxdiff:",
          float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                got.astype(jnp.float32)))), flush=True)


if __name__ == "__main__":
    main()
