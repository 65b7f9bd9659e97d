#!/usr/bin/env python
"""Stage-prefix deltas of the deint-native Pallas serving path (720p 2x).

Each probe adds one stage; deltas attribute the frame, and each delta
prints the stage's ALGORITHMIC MACs and the resulting per-stage MFU
(useful MACs / delta / 197 TF/s v5e bf16 peak — the paired trunk kernel's
12x score inflation is deliberately NOT counted as useful work, matching
PERFORMANCE.md's effective-MFU convention). Mirrors the real
_packed_forward routing (bf16, compose_tails, pallas_serve, fused2
trunk) including the round-5 default SPLIT branch-B tail
(tail_finish_stream, hi_lo_fin=off); pass "composed" to probe the
round-4 folded tailB instead.

Usage: python tools/deint_stage_bench.py [K] [composed]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    K = int(nums[0]) if nums else 10
    from transformerupscaler_tpu.models.upsampler import composed_tail_kernel
    from transformerupscaler_tpu.ops.conv import conv2d_packed_dots
    from transformerupscaler_tpu.ops.pallas.stream import (
        conv3x3_deint_stream,
        embed_stream,
        tail_macro8_stream,
        unembed_combine_stream,
    )
    from transformerupscaler_tpu.ops.pallas.trunk2 import fused_window_trunk_v2
    from transformerupscaler_tpu.ops.pixel_shuffle import pixel_shuffle
    from transformerupscaler_tpu.ops.resize import resize_shuffled
    from transformerupscaler_tpu.ops.windows import (
        window_partition,
        window_reverse,
    )
    from transformerupscaler_tpu.registry import get_model

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), dt)
    m = get_model("FastTransformer", dtype=dt, compose_tails=True,
                  pallas_serve=True, attn_impl="fused2")
    params = m.init(key, x, res_out=(1080, 1920))
    p = params["params"]
    print(f"device: {jax.devices()[0]}", flush=True)

    ka, ba = composed_tail_kernel(
        {k: v for k, v in p["up1"].items()}, 2, p["up1_conv_kernel"], None,
        dt)
    kc, bc = composed_tail_kernel(
        {k: v for k, v in p["final_upscale"].items()}, 2,
        p["final_upscale_conv_kernel"], p["final_upscale_conv_bias"], dt,
        pre_kernel=p["decoder_conv2"]["kernel"],
        pre_bias=p["decoder_conv2"]["bias"])
    blocks = [p[f"blocks_{i}"] for i in range(6)]

    from transformerupscaler_tpu.ops.conv import conv2d_packed_dots_deint

    split = "composed" not in sys.argv[1:]
    if split:
        from transformerupscaler_tpu.models.upsampler import (
            split_tail_kernels,
        )
        from transformerupscaler_tpu.ops.pallas.stream import (
            tail_finish_stream,
        )

        (km, bm), (kf, bf) = split_tail_kernels(
            {k: v for k, v in p["final_upscale"].items()}, 2,
            p["final_upscale_conv_kernel"], p["final_upscale_conv_bias"],
            dt, pre_kernel=p["decoder_conv2"]["kernel"],
            pre_bias=p["decoder_conv2"]["bias"])

    def stages(upto):
        def fn(pp, v):
            xp = v.reshape(1, 720, 640, 6)
            f1 = conv2d_packed_dots_deint(xp, p["conv1"]["kernel"].astype(dt),
                                          p["conv1"]["bias"], relu=True)
            if upto == 1:
                return f1
            ft = conv3x3_deint_stream(f1, p["conv2"]["kernel"].astype(dt),
                                      p["conv2"]["bias"], relu=True)
            if upto == 2:
                return ft
            a12 = tail_macro8_stream(ft, ka, ba, relu=True)
            if upto == 3:
                return a12
            tok = embed_stream(ft, p["patch_embed_kernel"],
                               p["patch_embed_bias"])
            if upto == 4:
                return tok + jnp.sum(a12) * 0
            win = window_partition(
                jnp.pad(tok, ((0, 0), (0, 6), (0, 0), (0, 0))),
                8).reshape(240, 64, 192)
            win = fused_window_trunk_v2(win, blocks, 12, 8)
            tok2 = window_reverse(win.reshape(1, 240, 64, 192),
                                  8, 96, 160)[:, :90]
            if upto == 5:
                return tok2 + jnp.sum(a12) * 0
            cd = unembed_combine_stream(tok2, ft, p["patch_unembed_kernel"],
                                        p["patch_unembed_bias"])
            if upto == 6:
                return cd + jnp.sum(a12) * 0
            dd = conv3x3_deint_stream(cd,
                                      p["decoder_conv1"]["kernel"].astype(dt),
                                      p["decoder_conv1"]["bias"], relu=True)
            if upto == 7:
                return dd + jnp.sum(a12) * 0
            if split:
                b12 = tail_finish_stream(dd, km, bm, kf, bf,
                                         hi_lo_fin="off")
            else:
                b12 = tail_macro8_stream(dd, kc, bc)
            if upto == 8:
                return b12 + jnp.sum(a12) * 0
            outp = (a12.reshape(1, 720, 1280, 12)
                    + b12.reshape(1, 720, 1280, 12))
            out = resize_shuffled(outp, 2, (1080, 1920))
            return jnp.clip(out, 0.0, 1.0)

        return fn

    # Algorithmic MACs per stage at 720p x2 (HW = 720*1280). Trunk: 6
    # blocks over 15360 padded tokens, per token 12*d^2 (qkv/proj/fc1/fc2)
    # + 2*64*d true score/context work (win=64) — the paired kernel's
    # inflated score dots are NOT useful work. Squash: phase-split resize
    # matmuls, (oh*ow/r^2)*3r^2*(4-tap contraction) per axis ~ small.
    HW = 720 * 1280
    d, ntok, win = 192, 96 * 160 * 6, 64  # ntok = padded tokens x blocks
    MACS = {
        1: 3 * 3 * 3 * 64 * HW,
        2: 3 * 3 * 64 * 64 * HW,
        3: 5 * 5 * 64 * 12 * HW,
        4: 64 * d * HW,
        5: ntok * (12 * d * d + 2 * win * d),
        6: d * 64 * HW,
        7: 3 * 3 * 64 * 64 * HW,
        8: ((5 * 5 * 64 * 12 + 3 * 3 * 12 * 12) if split
            else 7 * 7 * 64 * 12) * HW,
        9: 0,
    }
    PEAK = 197e12  # v5e bf16 MAC*2 FLOPs/s

    names = ["conv1 dots (deint out)", "+ conv2 deint", "+ tailA 5x5",
             "+ embed", "+ trunk fused2", "+ unembed+combine",
             "+ dec conv deint",
             "+ tailB split 5x5+fin" if split else "+ tailB 7x7",
             "+ add/squash/clip"]
    prev = 0.0
    for i, nm in enumerate(names, 1):
        per = probe(nm, stages(i), None, x, K, log=None)
        delta = per - prev
        mfu = (2 * MACS[i] / delta / PEAK * 100) if delta > 0 else 0.0
        gmac = MACS[i] / 1e9
        print(f"{nm:28s} cum {per * 1e3:7.3f} ms   delta "
              f"{1e3 * delta:+7.3f}   {gmac:7.1f} GMAC   MFU {mfu:5.1f}%",
              flush=True)
        prev = per

    f = jax.jit(lambda pp, v: m.apply(pp, v, res_out=(1080, 1920)))
    per = probe("full model.apply", lambda pp, v: f(params, v), None, x, K,
                log=None)
    tot = sum(MACS.values())
    print(f"{'full model.apply':28s} cum {per * 1e3:7.3f} ms   "
          f"total {tot / 1e9:.1f} GMAC   effective MFU "
          f"{2 * tot / per / PEAK * 100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
