#!/usr/bin/env python
"""Trunk stage breakdown at the headline geometry (tokens 90x160, d=192,
6 blocks, 12 heads of 16, window 8). Decomposes the 2.86 ms trunk into
partition / qkv / attention-core / proj / MLP / norms to find the loss.

Usage: python tools/trunk_bench.py [K] [probe names...]
Probes: full block attn mlp qkv core gemm part
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    which = set(sys.argv[2:]) or {"full", "block", "attn", "mlp", "qkv",
                                  "core", "gemm", "part"}
    wpc = int(os.environ.get("TUX_TRUNK_WPC", "8"))
    from transformerupscaler_tpu.models.common import (
        WindowBlock,
        run_window_trunk,
    )
    from transformerupscaler_tpu.ops.attention import window_attention
    from transformerupscaler_tpu.ops.relpos import gather_relative_bias
    from transformerupscaler_tpu.ops.windows import (
        window_partition,
        window_reverse,
    )

    dt = jnp.bfloat16
    d, heads, ws, hd = 192, 12, 8, 16
    key = jax.random.PRNGKey(0)
    tokens = jax.random.uniform(key, (1, 90, 160, d), dt)
    win = jax.random.uniform(key, (240, ws * ws, d), dt)
    print(f"device: {jax.devices()[0]}", flush=True)

    blk = WindowBlock(d, ws, heads, 4.0, 0.0, dtype=dt)
    bp = blk.init(jax.random.PRNGKey(1), win)
    blocks6 = [blk] * 6  # same params each block: timing-equivalent

    if "part" in which:
        probe("window partition+reverse roundtrip",
              lambda p, t: window_reverse(
                  window_partition(t, ws).reshape(1, 240, ws * ws, d),
                  ws, 96, 160)[:, :90],
              None, jnp.pad(tokens, ((0, 0), (0, 6), (0, 0), (0, 0))),
              K, log=print)
    if "full" in which:
        def full(p, t):
            out = t
            for _ in range(6):
                out = blk.apply(p, window_partition(
                    jnp.pad(out, ((0, 0), (0, 6), (0, 0), (0, 0))),
                    ws).reshape(240, ws * ws, d))
                out = window_reverse(out.reshape(1, 240, ws * ws, d),
                                     ws, 96, 160)[:, :90]
            return out
        probe("6 blocks + per-block partition (upper bd)", full, bp, tokens,
              K, log=print)

        def full2(p, t):
            w = window_partition(
                jnp.pad(t, ((0, 0), (0, 6), (0, 0), (0, 0))),
                ws).reshape(240, ws * ws, d)
            for _ in range(6):
                w = blk.apply(p, w)
            return window_reverse(w.reshape(1, 240, ws * ws, d),
                                  ws, 96, 160)[:, :90]
        probe("trunk: partition once + 6 blocks", full2, bp, tokens, K,
              log=print)
    if "block" in which:
        probe("one WindowBlock", lambda p, w: blk.apply(p, w), bp, win, K,
              log=print)
    pp = bp["params"]
    if "attn" in which:
        probe("attn sublayer (LN+attn+res)",
              lambda p, w: w + window_attention(
                  jax.nn.standardize(w, epsilon=1e-5),
                  p["attn"]["qkv_kernel"].astype(dt),
                  p["attn"]["qkv_bias"],
                  p["attn"]["proj_kernel"].astype(dt),
                  p["attn"]["proj_bias"],
                  p["attn"]["bias_table"], heads, ws),
              pp, win, K, log=print)
    if "mlp" in which:
        def mlp(p, w):
            z = jax.nn.standardize(w, epsilon=1e-5)
            y = jnp.einsum("bnc,cd->bnd", z,
                           p["mlp_fc1"]["kernel"].astype(dt))
            y = jax.nn.gelu(y + p["mlp_fc1"]["bias"].astype(dt),
                            approximate=False)
            y = jnp.einsum("bnc,cd->bnd", y,
                           p["mlp_fc2"]["kernel"].astype(dt))
            return w + y + p["mlp_fc2"]["bias"].astype(dt)
        probe("mlp sublayer (LN+fc1+gelu+fc2+res)", mlp, pp, win, K,
              log=print)
    if "qkv" in which:
        probe("qkv GEMM only",
              lambda p, w: jnp.einsum(
                  "bnc,cd->bnd", w, p["attn"]["qkv_kernel"].astype(dt))
              + p["attn"]["qkv_bias"].astype(dt),
              pp, win, K, log=print)
    if "core" in which:
        def core(p, qkv):
            b, n, _ = qkv.shape
            q3 = qkv.reshape(b, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = q3[0] * (hd ** -0.5), q3[1], q3[2]
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                              preferred_element_type=jnp.float32)
            bias = gather_relative_bias(
                p["attn"]["bias_table"].astype(jnp.float32), ws)
            attn = jax.nn.softmax(attn + bias[None], axis=-1).astype(dt)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
            return out.transpose(0, 2, 1, 3).reshape(b, n, d)
        qkv0 = jax.random.uniform(key, (240, ws * ws, 3 * d), dt)
        probe("attention core (split+scores+softmax+out)", core, pp, qkv0,
              K, log=print)
    if which & {"v1", "v2", "v2sweep", "pair", "pairint8", "grouped",
                "truedot"}:
        from transformerupscaler_tpu.ops.pallas.trunk import (
            fused_window_trunk,
        )
        from transformerupscaler_tpu.ops.pallas.trunk2 import (
            fused_window_trunk_v2,
        )
        params6 = [bp["params"]] * 6
        win240 = jax.random.uniform(key, (240, ws * ws, d), dt)
        if "v1" in which:
            probe("fused trunk v1 (6 layers, 240 win)",
                  lambda p, w: fused_window_trunk(w, params6, heads, ws),
                  None, win240, K, log=print)
        if "v2" in which:
            probe(f"fused trunk v2 (6 layers, wpc={wpc})",
                  lambda p, w: fused_window_trunk_v2(
                      w, params6, heads, ws, windows_per_cell=wpc),
                  None, win240, K, log=print)
        if "pair" in which:
            # paired vs unpaired at the same wpc, same process (the only
            # trustworthy comparison; cross-process variance ~±0.3 ms).
            for wp in (8, 16, 24):
                probe(f"fused trunk v2 UNpaired wpc={wp}",
                      lambda p, w, wp=wp: fused_window_trunk_v2(
                          w, params6, heads, ws, windows_per_cell=wp,
                          pair=False),
                      None, win240, K, log=print)
                probe(f"fused trunk v2 PAIRED   wpc={wp}",
                      lambda p, w, wp=wp: fused_window_trunk_v2(
                          w, params6, heads, ws, windows_per_cell=wp,
                          pair=True),
                      None, win240, K, log=print)
        if "pairint8" in which:
            import numpy as _np
            ia = (_np.full((6, d), 4.0, _np.float32),
                  _np.full((6, d), 4.0, _np.float32),
                  _np.full((6, d), 4.0, _np.float32),
                  _np.full((6, 4 * d), 4.0, _np.float32))
            for wp in (16, 24):
                probe(f"fused trunk v2 PAIR+INT8static wpc={wp}",
                      lambda p, w, wp=wp: fused_window_trunk_v2(
                          w, params6, heads, ws, windows_per_cell=wp,
                          int8_acts=ia),
                      None, win240, K, log=print)
                probe(f"fused trunk v2 PAIR+INT8rowwise wpc={wp}",
                      lambda p, w, wp=wp: fused_window_trunk_v2(
                          w, params6, heads, ws, windows_per_cell=wp,
                          int8_acts="rowwise"),
                      None, win240, K, log=print)
        if "grouped" in which:
            # grouped-head vs paired, same process. g=6 is the tile-math
            # favourite (K util 75%, 24 vs 42 passes/pair-layer).
            probe("fused trunk v2 PAIRED   wpc=8 (ref)",
                  lambda p, w: fused_window_trunk_v2(
                      w, params6, heads, ws, windows_per_cell=8,
                      pair=True),
                  None, win240, K, log=print)
            import os as _os
            cfgs = _os.environ.get("TUX_GROUP_SWEEP", "6:8,12:8")
            for tok in cfgs.split(","):
                g, wp = (int(v) for v in tok.split(":"))
                probe(f"fused trunk v2 GROUPED g={g} wpc={wp}",
                      lambda p, w, g=g, wp=wp: fused_window_trunk_v2(
                          w, params6, heads, ws, windows_per_cell=wp,
                          group=g),
                      None, win240, K, log=print)
        if "truedot" in which:
            # true per-head dots vs paired, same process (verdict r3 #2b:
            # the 12x head-mask score inflation, ~27 of 109 GF).
            probe("fused trunk v2 PAIRED   wpc=8 (ref)",
                  lambda p, w: fused_window_trunk_v2(
                      w, params6, heads, ws, windows_per_cell=8,
                      pair=True),
                  None, win240, K, log=print)
            os.environ["TUX_TRUNK_TRUEDOT"] = "1"
            for wp in (4, 8, 16):
                probe(f"fused trunk v2 TRUEDOT wpc={wp}",
                      lambda p, w, wp=wp: fused_window_trunk_v2(
                          w, params6, heads, ws, windows_per_cell=wp,
                          pair=True),
                      None, win240, K, log=print)
            del os.environ["TUX_TRUNK_TRUEDOT"]
        if "v2sweep" in which:
            for wp in (4, 6, 10, 12, 16, 24):
                probe(f"fused trunk v2 wpc={wp}",
                      lambda p, w, wp=wp: fused_window_trunk_v2(
                          w, params6, heads, ws, windows_per_cell=wp),
                      None, win240, K, log=print)
    if "gemm" in which:
        k1 = jax.random.uniform(key, (d, 4 * d), dt) * 0.05
        k2 = jax.random.uniform(key, (4 * d, d), dt) * 0.05
        probe("raw MLP GEMM pair + gelu (15360,192)",
              lambda p, w: jnp.einsum(
                  "bnc,cd->bnd",
                  jax.nn.gelu(jnp.einsum("bnc,cd->bnd", w, k1),
                              approximate=False), k2),
              None, win, K, log=print)


if __name__ == "__main__":
    main()
