#!/usr/bin/env python
"""Round-3 full-model configs at the headline geometry (720p -> 1080p 2x):

  bf16 pallas          compose_tails + pallas_serve (stream conv/tail/patch)
  int8 static          int8_serve full scope, static scales, all-XLA
  int8 static + pallas the 120-fps candidate: int8 convs/tails + Pallas
                       bf16 patch embed/unembed + bf16 conv1

Usage: python tools/r3_model_bench.py [K] [config names...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.probe_lib import probe


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    which = set(sys.argv[2:]) or {"pallas", "int8", "int8pallas"}
    from transformerupscaler_tpu.registry import get_model

    res_out = (1080, 1920)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 720, 1280, 3), jnp.bfloat16)
    base = get_model("FastTransformer", dtype=jnp.bfloat16,
                     compose_tails=True)
    params = base.init(key, x, res_out=res_out)
    print(f"device: {jax.devices()[0]}", flush=True)

    def run(name, **kw):
        m = get_model("FastTransformer", dtype=jnp.bfloat16,
                      compose_tails=True, **kw)
        per = probe(name, lambda p, v: m.apply(p, v, res_out=res_out),
                    params, x, K, log=print)
        print(f"    -> {1.0 / per:8.2f} fps", flush=True)

    scales = None
    if which & {"int8", "int8pallas", "int8pallasf2", "tails", "best"}:
        m_dyn = get_model("FastTransformer", dtype=jnp.bfloat16,
                          compose_tails=True, int8_serve=True)
        _, inter = jax.jit(
            lambda pp, v: m_dyn.apply(pp, v, res_out=res_out,
                                      mutable=["intermediates"]))(params, x)
        raw = inter["intermediates"]

        def grab(n):
            k = f"int8_scale_{n}"
            if k not in raw:
                return (1.0,)
            return tuple((np.asarray(raw[k][0], np.float64) * 1.1).tolist())

        scales = tuple(grab(n)
                       for n in ("feat1", "feat", "combined", "dec", "tokens"))
        print("calibrated (1 dynamic frame, margin 1.1)", flush=True)

    if "pallas" in which:
        run("bf16 pallas (stream conv/tail/patch)", pallas_serve=True)
    if "pallasf2" in which:
        run("bf16 pallas + fused2 trunk", pallas_serve=True,
            attn_impl="fused2")
    if "int8" in which:
        run("int8 full static (all-XLA)", int8_serve=True,
            int8_scales=scales)
    if "int8pallas" in which:
        run("int8 full static + pallas patch", int8_serve=True,
            int8_scales=scales, pallas_serve=True)
    if "int8pallasf2" in which:
        run("int8 full static + pallas + fused2 trunk", int8_serve=True,
            int8_scales=scales, pallas_serve=True, attn_impl="fused2")
    if "trunkint8" in which:
        # rowwise int8 trunk GEMMs on the bf16 pallas pipeline (no conv
        # quantization) — implies the paired trunk kernel.
        run("bf16 pallas + int8 trunk", pallas_serve=True, int8_trunk=True,
            attn_impl="fused2")
    if "best" in which:
        # the full stack: int8 tails + rowwise int8 trunk (paired).
        run("int8 tails + int8 trunk + pallas", int8_serve=True,
            int8_scope="tails", int8_scales=scales, pallas_serve=True,
            int8_trunk=True, attn_impl="fused2")
    if "groupedf2" in which:
        # grouped-head trunk vs the paired default, same process (env is
        # read at trace time, so flipping it between runs works).
        run("bf16 pallas + fused2 PAIRED trunk", pallas_serve=True,
            attn_impl="fused2")
        os.environ["TUX_TRUNK_GROUP"] = os.environ.get("TUX_G", "6")
        run(f"bf16 pallas + fused2 GROUPED g={os.environ['TUX_TRUNK_GROUP']}",
            pallas_serve=True, attn_impl="fused2")
        del os.environ["TUX_TRUNK_GROUP"]
    if "tails" in which:
        # The 120-fps candidate: bf16 Pallas pipeline, conv2/dec emit int8
        # in-kernel, both composed tails as int8 MXU stream kernels.
        run("int8 tails static + pallas + fused2", int8_serve=True,
            int8_scope="tails", int8_scales=scales, pallas_serve=True,
            attn_impl="fused2")


if __name__ == "__main__":
    main()
