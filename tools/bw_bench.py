#!/usr/bin/env python
"""HBM bandwidth + layout ground truth for the 118 MB feature tensors.

Answers: what do elementwise passes over feat-sized tensors actually cost in
XLA and in Pallas (i.e. what is the achievable effective bandwidth), and
which patch-embed formulation is fastest. Chained full-sum probes.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def chained(apply_fn, M):
    def fn(x):
        def body(i, carry):
            y = apply_fn(carry)
            s = jnp.sum(y.astype(jnp.float32))
            return carry * (1.0 + 0.0 * s.astype(carry.dtype))
        return jnp.ravel(lax.fori_loop(0, M, body, x))[0]
    return jax.jit(fn)


def timed(fn, x, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(fn(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe(name, apply_fn, x, K=8, bytes_moved=None):
    f1, fK = chained(apply_fn, 1), chained(apply_fn, K)
    _ = np.asarray(f1(x))
    _ = np.asarray(fK(x))
    t1, tK = timed(f1, x), timed(fK, x)
    per = (tK - t1) / (K - 1)
    bw = f"  {bytes_moved / per / 1e9:7.0f} GB/s" if bytes_moved else ""
    print(f"{name:46s} {per * 1e3:8.3f} ms{bw}", flush=True)
    return per


def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + jnp.asarray(1.0, x_ref.dtype)


def pallas_copy(x, rows):
    h = x.shape[0]
    return pl.pallas_call(
        copy_kernel,
        grid=(h // rows,),
        in_specs=[pl.BlockSpec((rows, *x.shape[1:]), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, *x.shape[1:]), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def main():
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    mb = 720 * 1280 * 64 * 2  # 118 MB
    print(f"device: {jax.devices()[0]}; feat bytes = {mb/1e6:.0f} MB",
          flush=True)

    feat_p = jax.random.uniform(key, (720, 640, 128), dt)   # packed layout
    feat_n = jax.random.uniform(key, (720, 1280, 64), dt)   # NHWC layout

    probe("XLA add1 (720,640,128)", lambda v: v + 1, feat_p, bytes_moved=2 * mb)
    probe("XLA add1 (720,1280,64)", lambda v: v + 1, feat_n, bytes_moved=2 * mb)
    probe("pallas add1 (720,640,128) 16-row blocks",
          lambda v: pallas_copy(v, 16), feat_p, bytes_moved=2 * mb)
    probe("pallas add1 (720,640,128) 24-row blocks",
          lambda v: pallas_copy(v, 24), feat_p, bytes_moved=2 * mb)

    # patch embed formulations (feat -> (90,160,192) tokens)
    ke = jax.random.normal(key, (8, 8, 64, 192), dt) * 0.05
    from transformerupscaler_tpu.ops.patch import patch_embed

    probe("embed XLA reshape-GEMM",
          lambda v: patch_embed(v[None], ke, None), feat_n,
          bytes_moved=mb)

    dn = lax.conv_dimension_numbers((1, 720, 1280, 64), (8, 8, 64, 192),
                                    ("NHWC", "HWIO", "NHWC"))
    probe("embed lax.conv k8s8",
          lambda v: lax.conv_general_dilated(
              v[None], ke, (8, 8), ((0, 0), (0, 0)),
              dimension_numbers=dn).astype(dt), feat_n, bytes_moved=mb)

    # 32-slice einsum: no patches materialized, slices feed GEMMs directly
    wv = ke.reshape(8, 4, 2, 64, 192).reshape(8, 4, 128, 192)

    def embed_slices(v):
        fv = v.reshape(90, 8, 160, 4, 128)
        acc = jnp.zeros((90, 160, 192), jnp.float32)
        for i in range(8):
            for g in range(4):
                acc = acc + jnp.einsum(
                    "twc,cd->twd", fv[:, i, :, g, :], wv[i, g],
                    preferred_element_type=jnp.float32)
        return acc.astype(dt)

    probe("embed 32-slice einsum", embed_slices, feat_n, bytes_moved=mb)


if __name__ == "__main__":
    main()
