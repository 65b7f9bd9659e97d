#!/usr/bin/env python
"""Cumulative-prefix attribution of the STATIC int8 full-scope serving
forward (the 10.4 ms config) — where do the remaining milliseconds live?

Mirrors models/fast_transformer.py:_packed_forward's i8a+i8b path op-for-op
as prefix closures (same ops, same layouts, static scales baked as
constants), probed with the chained abs-sum method (tools/probe_lib.py).
Successive deltas attribute every stage of the real int8 frame.

Usage: python tools/int8_stage_bench.py [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    from transformerupscaler_tpu.registry import get_model
    from transformerupscaler_tpu.models.common import run_window_trunk
    from transformerupscaler_tpu.models.upsampler import composed_tail_kernel
    from transformerupscaler_tpu.ops.conv import (
        conv2d_packed_int8,
        conv2d_tail_packed_int8,
        tail_block,
    )
    from transformerupscaler_tpu.ops.patch import (
        patch_embed_packed_int8,
        patch_unembed_packed_int8,
    )
    from transformerupscaler_tpu.ops.pixel_shuffle import pixel_shuffle
    from transformerupscaler_tpu.ops.quant import quantize_act, quantize_act_ch
    from transformerupscaler_tpu.ops.resize import resize_shuffled

    dt = jnp.bfloat16
    res_out = (1080, 1920)
    scale = 2
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    base = get_model("FastTransformer", dtype=dt, compose_tails=True,
                     packed_serve=True)
    params = base.init(key, x, res_out=res_out)
    print(f"device: {jax.devices()[0]}", flush=True)

    # Static scales from one dynamic-quant pass (as int8_full_bench.py).
    m_dyn = get_model("FastTransformer", dtype=dt, compose_tails=True,
                      int8_serve=True)
    _, inter = jax.jit(
        lambda pp, v: m_dyn.apply(pp, v, res_out=res_out,
                                  mutable=["intermediates"])
    )(params, x)
    raw = inter["intermediates"]
    scales = {n: np.asarray(raw[f"int8_scale_{n}"][0], np.float32) * 1.25
              for n in ("feat1", "feat", "combined", "dec", "tokens")}
    m_st = get_model("FastTransformer", dtype=dt, compose_tails=True,
                     int8_serve=True,
                     int8_scales=tuple(tuple(scales[n].tolist()) for n in
                                       ("feat1", "feat", "combined", "dec",
                                        "tokens")))

    def make_prefix(n):
        def fwd(m, v):
            b, h, w, cin = v.shape
            xp = v.reshape(b, h, w // 2, 2 * cin)
            p1 = m.conv1.variables["params"]
            p2 = m.conv2.variables["params"]

            def q(name, t, packed=True):
                s = jnp.asarray(scales[name], jnp.float32)
                qq, _ = quantize_act_ch(t, jnp.tile(s, 2) if packed else s)
                return qq, s

            xq, _ = quantize_act(xp, 1.0 / 127)
            feat1 = conv2d_packed_int8(xq, p1["kernel"], 1.0 / 127,
                                       p1["bias"], relu=True, out_dtype=dt)
            if n == 1:
                return feat1
            f1q, s1 = q("feat1", feat1)
            featp = conv2d_packed_int8(f1q, p2["kernel"], s1, p2["bias"],
                                       relu=True, out_dtype=dt)
            if n == 2:
                return featp
            ka, ba = composed_tail_kernel(m.up1._params, scale,
                                          m.up1_conv_kernel, None, dt)
            blk = tail_block(ka.shape[3], w)
            fq, s2 = q("feat", featp)
            a12 = conv2d_tail_packed_int8(fq, ka, s2, ba, relu=True,
                                          out_dtype=dt, block=blk)
            if n == 3:
                return a12
            tokens = patch_embed_packed_int8(fq, s2, m.patch_embed_kernel,
                                             m.patch_embed_bias, out_dtype=dt)
            if n == 4:
                return tokens + 0.0 * jnp.sum(a12.astype(dt))
            tokens = run_window_trunk(tokens, m.blocks, m.window_size)
            if n == 5:
                return tokens + 0.0 * jnp.sum(a12.astype(dt))
            tq, s5 = q("tokens", tokens, packed=False)
            combined = patch_unembed_packed_int8(
                tq, s5, m.patch_unembed_kernel, m.patch_unembed_bias,
                out_dtype=dt) + featp
            if n == 6:
                return combined + 0.0 * jnp.sum(a12.astype(dt))
            pd1 = m.decoder_conv1.variables["params"]
            cq, s3 = q("combined", combined)
            dec = conv2d_packed_int8(cq, pd1["kernel"], s3, pd1["bias"],
                                     relu=True, out_dtype=dt)
            if n == 7:
                return dec + 0.0 * jnp.sum(a12.astype(dt))
            pd2 = m.decoder_conv2.variables["params"]
            kc, bc = composed_tail_kernel(
                m.final_upscale._params, scale, m.final_upscale_conv_kernel,
                m.final_upscale_conv_bias, dt,
                pre_kernel=pd2["kernel"], pre_bias=pd2["bias"])
            dq, s4 = q("dec", dec)
            b12 = conv2d_tail_packed_int8(dq, kc, s4, bc, out_dtype=dt,
                                          block=blk)
            if n == 8:
                return b12 + 0.0 * jnp.sum(a12.astype(dt))
            rr3 = 3 * scale * scale
            outp = (a12.reshape(b, h, w, rr3) + b12.reshape(b, h, w, rr3))
            out_hw = (h * scale, w * scale)
            if tuple(res_out) != out_hw:
                out = resize_shuffled(outp, scale, res_out)
            else:
                out = pixel_shuffle(outp, scale)
            return jnp.clip(out, 0.0, 1.0)
        return fwd

    names = [
        "1 quant+conv1 int8",
        "2 + quant+conv2 int8",
        "3 + quant+tailA int8 (branch A done)",
        "4 + patch_embed int8",
        "5 + window trunk (bf16)",
        "6 + quant+unembed int8 + combine",
        "7 + quant+decoder conv int8",
        "8 + quant+tailB int8",
        "9 + add + shuffle/resize + clip",
    ]
    prev = 0.0
    for i, name in enumerate(names, start=1):
        fwd = make_prefix(i)
        per = probe(name, lambda pp, v, f=fwd: base.apply(pp, v, method=f),
                    params, x, K, log=print)
        print(f"    delta: {(per - prev) * 1e3:8.3f} ms", flush=True)
        prev = per
    probe("10 full static int8 model.apply",
          lambda pp, v: m_st.apply(pp, v, res_out=res_out), params, x, K,
          log=print)


if __name__ == "__main__":
    main()
