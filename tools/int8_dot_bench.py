#!/usr/bin/env python
"""Pallas int8 vs bf16 dot throughput at the fused2-trunk GEMM shapes.

Decides whether int8 trunk GEMMs (qkv/proj/fc1/fc2 inside
ops/pallas/trunk2.py) are worth building: v5e's MXU is 2x int8-vs-bf16 on
paper (394 TOPS vs 197 TFLOPS), but the measured Pallas int8 conv win was
well under 2x — this isolates whether Mosaic int8 dots actually double at
the (1024, 192) x (192, 768) trunk shapes, including the in-kernel
activation-quantize cost the real kernel would pay.

Usage: python tools/int8_dot_bench.py [K]
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import transformerupscaler_tpu  # noqa: F401  (TUX_PLATFORM device pinning)
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.probe_lib import probe

SHAPES = [  # (t, k, n): qkv, proj, fc1, fc2 at wpc=16
    (1024, 192, 576),
    (1024, 192, 192),
    (1024, 192, 768),
    (1024, 768, 192),
]


def _pad_back(y, width, dt):
    if y.shape[1] < width:
        y = jnp.pad(y, ((0, 0), (0, width - y.shape[1])))
    return y.astype(dt)


def _bf16_kernel(x_ref, w_ref, o_ref, *, reps):
    x = x_ref[:]
    acc = x
    for _ in range(reps):
        y = jnp.dot(acc[:, :w_ref.shape[0]], w_ref[:],
                    preferred_element_type=jnp.float32)
        acc = _pad_back(y, x.shape[1], x.dtype)
    o_ref[:] = acc


def _int8_kernel(x_ref, w_ref, sw_ref, o_ref, *, reps):
    # In-kernel dynamic-free act quantize (static scalar scale, the real
    # kernel's plan) + int8 MXU dot + dequant — the full per-GEMM cost.
    x = x_ref[:]
    acc = x
    sa = jnp.float32(1.0 / 127.0)
    for _ in range(reps):
        xq = jnp.clip(jnp.round(acc[:, :w_ref.shape[0]].astype(jnp.float32)
                                * 127.0), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = _pad_back(y.astype(jnp.float32) * (sa * sw_ref[0:1, :]),
                        x.shape[1], x.dtype)
    o_ref[:] = acc


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}", flush=True)
    for (t, k, n) in SHAPES:
        kk = max(k, n)  # carry width so reps chain (slice back each rep)
        x = jax.random.uniform(key, (t, kk), jnp.bfloat16) - 0.5
        wb = jax.random.uniform(key, (k, n), jnp.bfloat16) - 0.5
        wq = jnp.clip(jnp.round(
            jax.random.uniform(key, (k, n), jnp.float32) * 254 - 127),
            -127, 127).astype(jnp.int8)
        sw = jnp.full((1, n), 1e-3, jnp.float32)
        reps = 8

        def vmem(a):
            return pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                                memory_space=pltpu.VMEM)

        interp = jax.default_backend() != "tpu"
        fb = pl.pallas_call(
            partial(_bf16_kernel, reps=reps),
            in_specs=[vmem(x), vmem(wb)],
            out_specs=vmem(x),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interp,
        )
        fi = pl.pallas_call(
            partial(_int8_kernel, reps=reps),
            in_specs=[vmem(x), vmem(wq), vmem(sw)],
            out_specs=vmem(x),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interp,
        )
        per_b = probe(f"bf16 dot {t}x{k}x{n} (x{reps})",
                      lambda p, v: fb(v, wb), None, x, K, log=print)
        per_i = probe(f"int8 dot {t}x{k}x{n} (x{reps})",
                      lambda p, v: fi(v, wq, sw), None, x, K, log=print)
        print(f"    int8/bf16 ratio: {per_i / per_b:.3f}", flush=True)


if __name__ == "__main__":
    main()
