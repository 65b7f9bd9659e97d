#!/usr/bin/env python
"""Ablation timing of the fused2 trunk kernel: which piece costs what.

Variants toggle pieces of the per-layer body (WRONG MATH for some — timing
only): full, no-softmax (scores scaled straight through), no-attn (MLP
path only), no-mlp, no-ln. Usage: python tools/trunk_ablate.py [K]
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.probe_lib import probe
from transformerupscaler_tpu.models.common import WindowBlock
from transformerupscaler_tpu.ops.pallas.trunk import (
    _gelu_exact,
    _head_mask,
    _layernorm,
)
from transformerupscaler_tpu.ops.relpos import gather_relative_bias

import numpy as np


def _kernel(x_ref, mask_ref, ln1s, ln1b, qkvw, qkvb, projw, projb,
            ln2s, ln2b, fc1w, fc1b, fc2w, fc2b, bias_ref, out_ref,
            *, layers, heads, n, wpc, attn, mlp, softmax, ln, gelu):
    c = x_ref.shape[-1]
    t = wpc * n
    dt = x_ref.dtype
    scale = jnp.asarray((c // heads) ** -0.5, dt)
    mask = mask_ref[:]

    x = x_ref[:].reshape(t, c)
    for l in range(layers):
        if attn:
            y = _layernorm(x, ln1s[l], ln1b[l]).astype(dt) if ln else x
            qkv = (jnp.dot(y, qkvw[l], preferred_element_type=jnp.float32)
                   .astype(dt) + qkvb[l]).reshape(wpc, n, 3 * c)
            bias_l = bias_ref[l]
            scores = []
            for w in range(wpc):
                q = qkv[w, :, 0:c] * scale
                k = qkv[w, :, c:2 * c]
                qp = jnp.broadcast_to(q[None], (heads, n, c)).reshape(
                    heads * n, c) * mask
                s = jax.lax.dot_general(
                    qp, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                scores.append(s + bias_l)
            ss = jnp.stack(scores)
            if softmax:
                m = jnp.max(ss, axis=-1, keepdims=True)
                p = jnp.exp(ss - m)
                p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
            else:
                p = (ss * 0.01).astype(dt)
            ctxs = []
            for w in range(wpc):
                v = qkv[w, :, 2 * c:3 * c]
                o = jnp.dot(p[w], v,
                            preferred_element_type=jnp.float32).astype(dt)
                ctxs.append(jnp.sum((o * mask).reshape(heads, n, c), axis=0))
            attn_o = jnp.concatenate(ctxs, axis=0)
            x = x + (jnp.dot(attn_o, projw[l],
                             preferred_element_type=jnp.float32)
                     .astype(dt) + projb[l])
        if mlp:
            y2 = _layernorm(x, ln2s[l], ln2b[l]).astype(dt) if ln else x
            h1 = (jnp.dot(y2, fc1w[l], preferred_element_type=jnp.float32)
                  .astype(dt) + fc1b[l])
            h1 = _gelu_exact(h1) if gelu else jnp.maximum(h1, 0.0)
            x = x + (jnp.dot(h1, fc2w[l], preferred_element_type=jnp.float32)
                     .astype(dt) + fc2b[l])

    out_ref[:] = x.reshape(wpc, n, c)


def run(win, params, heads, ws, wpc=16, **flags):
    nw, n, c = win.shape
    dt = win.dtype
    layers = len(params)
    pad = (wpc - nw % wpc) % wpc
    if pad:
        win = jnp.pad(win, ((0, pad), (0, 0), (0, 0)))

    def stack(path):
        return jnp.stack([jnp.asarray(
            p[path[0]][path[1]], dt) for p in params])

    ln1s = stack(["norm1", "scale"]).reshape(layers, 1, c)
    ln1b = stack(["norm1", "bias"]).reshape(layers, 1, c)
    qkvw = stack(["attn", "qkv_kernel"])
    qkvb = stack(["attn", "qkv_bias"]).reshape(layers, 1, 3 * c)
    projw = stack(["attn", "proj_kernel"])
    projb = stack(["attn", "proj_bias"]).reshape(layers, 1, c)
    ln2s = stack(["norm2", "scale"]).reshape(layers, 1, c)
    ln2b = stack(["norm2", "bias"]).reshape(layers, 1, c)
    fc1w = stack(["mlp_fc1", "kernel"])
    fc1b = stack(["mlp_fc1", "bias"]).reshape(layers, 1, -1)
    fc2w = stack(["mlp_fc2", "kernel"])
    fc2b = stack(["mlp_fc2", "bias"]).reshape(layers, 1, c)
    bias = jnp.stack([
        gather_relative_bias(
            jnp.asarray(p["attn"]["bias_table"], jnp.float32), ws
        ).reshape(heads * n, n) for p in params])
    mask = jnp.asarray(_head_mask(heads, n, c), dt)

    def spec3(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_kernel, layers=layers, heads=heads, n=n, wpc=wpc, **flags),
        grid=((nw + pad) // wpc,),
        in_specs=[
            pl.BlockSpec((wpc, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads * n, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            spec3(ln1s), spec3(ln1b), spec3(qkvw), spec3(qkvb),
            spec3(projw), spec3(projb), spec3(ln2s), spec3(ln2b),
            spec3(fc1w), spec3(fc1b), spec3(fc2w), spec3(fc2b), spec3(bias),
        ],
        out_specs=pl.BlockSpec((wpc, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw + pad, n, c), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(win, mask, ln1s, ln1b, qkvw, qkvb, projw, projb, ln2s, ln2b,
      fc1w, fc1b, fc2w, fc2b, bias)
    return out[:nw] if pad else out


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    win = jax.random.uniform(key, (240, 64, 192), dt)
    blk = WindowBlock(192, 8, 12, 4.0, 0.0, dtype=dt)
    bp = blk.init(jax.random.PRNGKey(1), win)["params"]
    params6 = [bp] * 6
    print(f"device: {jax.devices()[0]}", flush=True)

    base = dict(attn=True, mlp=True, softmax=True, ln=True, gelu=True)
    for name, flags in (
            ("full", {}),
            ("no-softmax (scaled scores)", {"softmax": False}),
            ("no-gelu (relu)", {"gelu": False}),
            ("no-ln", {"ln": False}),
            ("mlp only", {"attn": False}),
            ("attn only", {"mlp": False}),
    ):
        probe(name, lambda p, w, f={**base, **flags}: run(
            w, params6, 12, 8, **f), None, win, K, log=print)


if __name__ == "__main__":
    main()
