#!/usr/bin/env python
"""Cumulative-prefix device benchmark of the FastTransformer serving forward.

Round-1 per-op probes (tools/op_bench.py) summed to ~15.5 ms while the full
frame measured 28.6 ms — per-op probes miss layout conversions, fusion
boundaries and elementwise stages. This probe times *cumulative prefixes* of
the exact serving forward (compose_tails=True, bf16), so successive
differences attribute every millisecond of the real frame.

Method: chained full-sum probes (see tools/op_bench.py docstring) — the only
trustworthy timing through the tunneled PJRT backend.

Usage: python tools/stage_bench.py [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, params, x, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(fn(params, x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chained(apply_fn, M):
    # abs-sum feedback: a plain full sum gets algebraically pushed through
    # purely-linear ops, fabricating fast numbers (see tools/probe_lib.py).
    def fn(p, x):
        def body(i, carry):
            y = apply_fn(p, carry)
            s = jnp.sum(jnp.abs(y.astype(jnp.float32)))
            return carry + (s != s).astype(carry.dtype)
        return jnp.ravel(lax.fori_loop(0, M, body, x))[0]
    return jax.jit(fn)


def probe(name, apply_fn, params, x, K=6):
    f1, fK = chained(apply_fn, 1), chained(apply_fn, K)
    t0 = time.perf_counter()
    _ = np.asarray(f1(params, x))
    _ = np.asarray(fK(params, x))
    compile_s = time.perf_counter() - t0
    t1, tK = timed(f1, params, x), timed(fK, params, x)
    per = (tK - t1) / (K - 1)
    print(f"{name:44s} {per * 1e3:8.3f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return per


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    from transformerupscaler_tpu.registry import get_model
    from transformerupscaler_tpu.ops.patch import patch_embed, patch_unembed
    from transformerupscaler_tpu.ops.resize import resize_shuffled  # noqa: F401
    from transformerupscaler_tpu.models.common import run_window_trunk

    dt = jnp.bfloat16
    res_out = (1080, 1920)
    model = get_model("FastTransformer", dtype=dt, compose_tails=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    params = model.init(key, x, res_out=res_out)
    print(f"device: {jax.devices()[0]}", flush=True)

    # Prefixes of the exact serving forward. At 720p the reflect pad is a
    # no-op (720, 1280 are multiples of 8), so it is omitted.
    def make_prefix(n):
        def fwd(m, v):
            feat = m.conv2(m.conv1(v))
            if n == 1:
                return feat
            up = m.up1(feat, 2, tail_kernel=m.up1_conv_kernel.astype(dt),
                       tail_relu=True, compose_tail=True,
                       return_preshuffle=True)
            if n == 2:
                return up
            tokens = patch_embed(feat, m.patch_embed_kernel.astype(dt),
                                 m.patch_embed_bias)
            if n == 3:
                return tokens + 0.0 * jnp.sum(up.astype(dt))
            tokens = run_window_trunk(tokens, m.blocks, 8)
            if n == 4:
                return tokens + 0.0 * jnp.sum(up.astype(dt))
            ft = patch_unembed(tokens, m.patch_unembed_kernel.astype(dt),
                               m.patch_unembed_bias)
            combined = feat + ft
            if n == 5:
                return combined + 0.0 * jnp.sum(up.astype(dt))
            dec = m.decoder_conv1(combined)
            residual = m.decoder_conv2(dec)
            if n == 6:
                return residual + 0.0 * jnp.sum(up.astype(dt))
            residual_up = m.final_upscale(
                residual, 2,
                tail_kernel=m.final_upscale_conv_kernel.astype(dt),
                tail_bias=m.final_upscale_conv_bias.astype(dt),
                compose_tail=True, return_preshuffle=True)
            out = up + residual_up
            if n == 7:
                return out
            out = resize_shuffled(out, 2, res_out)
            return jnp.clip(out, 0.0, 1.0)
        return fwd

    names = [
        "1 encoder conv1+conv2",
        "2 + up1 composed preshuffle (branch A)",
        "3 + patch_embed",
        "4 + window trunk (6 blocks)",
        "5 + unembed + combine",
        "6 + decoder convs",
        "7 + final_upscale + add (12ch)",
        "8 + fused squash resize + clip",
    ]
    prev = 0.0
    for i, name in enumerate(names, start=1):
        fwd = make_prefix(i)
        per = probe(name, lambda pp, v, f=fwd: model.apply(pp, v, method=f),
                    params, x, K)
        print(f"    delta: {(per - prev) * 1e3:8.3f} ms", flush=True)
        prev = per
    probe("9 model.apply full (the real thing)",
          lambda pp, v: model.apply(pp, v, res_out=res_out), params, x, K)


if __name__ == "__main__":
    main()
