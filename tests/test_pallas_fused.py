"""Numerics for the round-2 Pallas serving kernels (run interpreted on the
CPU test platform): fused trunk megakernel, fused patch embed/unembed+add,
and the width-2-packed conv. Each must match its XLA-path twin."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from transformerupscaler_tpu.ops.conv import conv2d, conv2d_packed2
from transformerupscaler_tpu.registry import get_model


def test_conv2d_packed2_matches_plain(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 40, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(64), jnp.float32)
    ref = conv2d(x, k, b, relu=True, auto_macro=False)
    got = conv2d_packed2(x, k, b, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_trunk_matches_xla_blocks(rng):
    from transformerupscaler_tpu.models.common import WindowBlock
    from transformerupscaler_tpu.ops.pallas.trunk import fused_window_trunk

    key = jax.random.PRNGKey(3)
    win = jax.random.uniform(key, (10, 64, 192), jnp.float32)
    blocks = [WindowBlock(192, 8, 12, dropout=0.0, dtype=jnp.float32)
              for _ in range(2)]
    params, outs = [], win
    for i, blk in enumerate(blocks):
        p = blk.init(jax.random.PRNGKey(i), outs)
        outs = blk.apply(p, outs)
        params.append(p["params"])

    got = fused_window_trunk(win, params, num_heads=12, window_size=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(outs),
                               rtol=2e-4, atol=2e-5)


def test_fused_trunk_v2_matches_xla_blocks(rng):
    from transformerupscaler_tpu.models.common import WindowBlock
    from transformerupscaler_tpu.ops.pallas.trunk2 import fused_window_trunk_v2

    key = jax.random.PRNGKey(7)
    win = jax.random.uniform(key, (10, 64, 192), jnp.float32)
    blocks = [WindowBlock(192, 8, 12, dropout=0.0, dtype=jnp.float32)
              for _ in range(2)]
    params, outs = [], win
    for i, blk in enumerate(blocks):
        p = blk.init(jax.random.PRNGKey(i), outs)
        outs = blk.apply(p, outs)
        params.append(p["params"])

    # windows_per_cell 4 also covers the nW % wpc != 0 zero-pad path.
    got = fused_window_trunk_v2(win, params, num_heads=12, window_size=8,
                                windows_per_cell=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(outs),
                               rtol=2e-4, atol=2e-5)


def test_fused_trunk_v2_paired_matches_xla_blocks(rng):
    """Window-paired attention (block-diagonal K/V pairing) is exact: the
    zero blocks kill every cross-window term, so outputs must match the
    XLA block loop at the same tolerance as the unpaired kernel."""
    from transformerupscaler_tpu.models.common import WindowBlock
    from transformerupscaler_tpu.ops.pallas.trunk2 import fused_window_trunk_v2

    key = jax.random.PRNGKey(11)
    win = jax.random.uniform(key, (10, 64, 192), jnp.float32)
    blocks = [WindowBlock(192, 8, 12, dropout=0.0, dtype=jnp.float32)
              for _ in range(2)]
    params, outs = [], win
    for i, blk in enumerate(blocks):
        p = blk.init(jax.random.PRNGKey(i), outs)
        outs = blk.apply(p, outs)
        params.append(p["params"])

    # wpc=4 covers pad (10 % 4), wpc=5 covers the odd-wpc bump (5 -> 6).
    for wpc in (4, 5):
        got = fused_window_trunk_v2(win, params, num_heads=12, window_size=8,
                                    windows_per_cell=wpc, pair=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(outs),
                                   rtol=2e-4, atol=2e-5)


def test_fused_trunk_v2_grouped_matches_xla_blocks(rng):
    """Grouped-head paired attention (queries stacked along M, heads in
    g-groups along the contraction, cross-window terms killed by -1e9 in
    the precomputed bias): exact for every divisor group size — same
    tolerance as the unpaired kernel."""
    from transformerupscaler_tpu.models.common import WindowBlock
    from transformerupscaler_tpu.ops.pallas.trunk2 import fused_window_trunk_v2

    key = jax.random.PRNGKey(17)
    win = jax.random.uniform(key, (10, 64, 192), jnp.float32)
    blocks = [WindowBlock(192, 8, 12, dropout=0.0, dtype=jnp.float32)
              for _ in range(2)]
    params, outs = [], win
    for i, blk in enumerate(blocks):
        p = blk.init(jax.random.PRNGKey(i), outs)
        outs = blk.apply(p, outs)
        params.append(p["params"])

    # wpc=4 covers pad (10 % 4), wpc=5 the odd-wpc bump; g=6 is the
    # shipped group size, 3 and 12 cover multi-group and single-group.
    for g, wpc in ((6, 4), (6, 5), (3, 4), (12, 4)):
        got = fused_window_trunk_v2(win, params, num_heads=12, window_size=8,
                                    windows_per_cell=wpc, group=g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(outs),
                                   rtol=2e-4, atol=2e-5)


def test_fused_trunk_v2_truedot_matches_xla_blocks(rng, monkeypatch):
    """True per-head score dots (TUX_TRUNK_TRUEDOT=1): cross-window terms
    are computed but killed by -1e9 in the precomputed bias, so outputs
    must match the XLA block loop at the unpaired kernel's tolerance."""
    from transformerupscaler_tpu.models.common import WindowBlock
    from transformerupscaler_tpu.ops.pallas.trunk2 import fused_window_trunk_v2

    key = jax.random.PRNGKey(23)
    win = jax.random.uniform(key, (10, 64, 192), jnp.float32)
    blocks = [WindowBlock(192, 8, 12, dropout=0.0, dtype=jnp.float32)
              for _ in range(2)]
    params, outs = [], win
    for i, blk in enumerate(blocks):
        p = blk.init(jax.random.PRNGKey(i), outs)
        outs = blk.apply(p, outs)
        params.append(p["params"])

    monkeypatch.setenv("TUX_TRUNK_TRUEDOT", "1")
    for wpc in (4, 5):  # pad coverage + odd-wpc bump
        got = fused_window_trunk_v2(win, params, num_heads=12, window_size=8,
                                    windows_per_cell=wpc, pair=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(outs),
                                   rtol=2e-4, atol=2e-5)


def test_fused_trunk_v2_int8_gemms_close_to_f32(rng):
    """int8 GEMMs inside the paired kernel: with safely-wide act scales the
    output stays within quantization noise of the XLA block loop — a
    wiring test (a transposed scale or missing fold blows up by orders of
    magnitude), not a quality gate (tools/int8_quality.py is that)."""
    from transformerupscaler_tpu.models.common import WindowBlock
    from transformerupscaler_tpu.ops.pallas.trunk2 import fused_window_trunk_v2

    key = jax.random.PRNGKey(13)
    win = jax.random.uniform(key, (8, 64, 192), jnp.float32)
    blocks = [WindowBlock(192, 8, 12, dropout=0.0, dtype=jnp.float32)
              for _ in range(2)]
    params, outs = [], win
    for i, blk in enumerate(blocks):
        p = blk.init(jax.random.PRNGKey(i), outs)
        outs = blk.apply(p, outs)
        params.append(p["params"])

    L = len(params)

    def run(s):
        int8_acts = (np.full((L, 192), s, np.float32),
                     np.full((L, 192), s, np.float32),
                     np.full((L, 192), s, np.float32),
                     np.full((L, 768), s, np.float32))
        got = fused_window_trunk_v2(win, params, num_heads=12, window_size=8,
                                    windows_per_cell=4, int8_acts=int8_acts)
        return np.max(np.abs(np.asarray(got) - np.asarray(outs)))

    # measured curve (see commit): U-shaped in the act scale — grid noise
    # grows ~2x per scale doubling above the optimum, clipping below it.
    err4, err16 = run(4.0), run(16.0)
    assert err4 < 0.3, f"int8 trunk error {err4} — scale wiring broken"
    assert err4 > 1e-6  # the int8 path really ran
    assert err16 > 2.0 * err4, (
        f"coarser act grid did not increase error ({err4} vs {err16}) — "
        "act scales are not reaching the kernel")


def test_trunk_int8_calibrated_scales(rng):
    """calib_trunk_int8 sows per-channel GEMM-input maxes; feeding the
    harvested scales into the int8 paired trunk must beat naive constant
    scales (the whole point of per-channel calibration)."""
    from transformerupscaler_tpu.models.common import WindowBlock
    from transformerupscaler_tpu.ops.pallas.trunk2 import fused_window_trunk_v2

    key = jax.random.PRNGKey(17)
    win = jax.random.uniform(key, (8, 64, 192), jnp.float32)
    blocks = [WindowBlock(192, 8, 12, dropout=0.0, dtype=jnp.float32)
              for _ in range(2)]
    calib_blocks = [WindowBlock(192, 8, 12, dropout=0.0, dtype=jnp.float32,
                                calib_trunk_int8=True) for _ in range(2)]
    params, outs = [], win
    scales = {"qkv": [], "proj": [], "fc1": [], "fc2": []}
    for i, (blk, cblk) in enumerate(zip(blocks, calib_blocks)):
        p = blk.init(jax.random.PRNGKey(i), outs)
        got, inter = cblk.apply(p, outs, mutable=["intermediates"])
        ii = inter["intermediates"]
        scales["qkv"].append(np.asarray(ii["trunk_i8_qkv"][0]))
        scales["proj"].append(np.asarray(ii["attn"]["trunk_i8_proj"][0]))
        scales["fc1"].append(np.asarray(ii["trunk_i8_fc1"][0]))
        scales["fc2"].append(np.asarray(ii["trunk_i8_fc2"][0]))
        outs = blk.apply(p, outs)
        # the calibration pass must not perturb the block output
        np.testing.assert_allclose(np.asarray(got), np.asarray(outs),
                                   rtol=1e-6, atol=1e-6)
        params.append(p["params"])

    int8_acts = tuple(np.stack(scales[k]).astype(np.float32)
                      for k in ("qkv", "proj", "fc1", "fc2"))
    got = fused_window_trunk_v2(win, params, num_heads=12, window_size=8,
                                windows_per_cell=4, int8_acts=int8_acts)
    err_cal = np.max(np.abs(np.asarray(got) - np.asarray(outs)))

    naive = (np.full((2, 192), 8.0, np.float32),
             np.full((2, 192), 8.0, np.float32),
             np.full((2, 192), 8.0, np.float32),
             np.full((2, 768), 8.0, np.float32))
    got_n = fused_window_trunk_v2(win, params, num_heads=12, window_size=8,
                                  windows_per_cell=4, int8_acts=naive)
    err_naive = np.max(np.abs(np.asarray(got_n) - np.asarray(outs)))
    assert err_cal < err_naive, (err_cal, err_naive)
    assert err_cal < 0.2, f"calibrated int8 trunk max error {err_cal}"

    # Dynamic per-row act scales (no calibration) must beat per-channel
    # static calibration: LN inputs are channel-homogeneous, so the win
    # comes from per-token grids.
    got_r = fused_window_trunk_v2(win, params, num_heads=12, window_size=8,
                                  windows_per_cell=4, int8_acts="rowwise")
    err_row = np.max(np.abs(np.asarray(got_r) - np.asarray(outs)))
    rms_row = np.sqrt(np.mean((np.asarray(got_r) - np.asarray(outs)) ** 2))
    assert err_row < err_cal, (err_row, err_cal)
    assert rms_row < 0.025, f"rowwise int8 trunk rms {rms_row}"


def test_model_attn_impl_fused2_matches_xla():
    """attn_impl='fused2' routes the whole trunk through the v2 megakernel;
    model output must match the XLA block loop."""
    key = jax.random.PRNGKey(9)
    x = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32)
    m_x = get_model("FastTransformer", dtype=jnp.float32)
    m_f = get_model("FastTransformer", dtype=jnp.float32, attn_impl="fused2")
    params = m_x.init(key, x, upscale_factor=2)
    y_x = m_x.apply(params, x, upscale_factor=2, require_ratio=False)
    y_f = m_f.apply(params, x, upscale_factor=2, require_ratio=False)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_x),
                               rtol=2e-4, atol=5e-5)


def test_model_int8_trunk_close_to_fused2():
    """int8_trunk routes the trunk GEMMs through rowwise int8; the model
    output must stay within quantization noise of the bf16 fused2 path
    (quality gating is tools/int8_quality.py on the trained checkpoint)."""
    key = jax.random.PRNGKey(21)
    x = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32)
    m_f = get_model("FastTransformer", dtype=jnp.float32, attn_impl="fused2")
    m_q = get_model("FastTransformer", dtype=jnp.float32, attn_impl="fused2",
                    int8_trunk=True)
    params = m_f.init(key, x, upscale_factor=2)
    y_f = m_f.apply(params, x, upscale_factor=2, require_ratio=False)
    y_q = m_q.apply(params, x, upscale_factor=2, require_ratio=False)
    d = np.asarray(y_q, np.float64) - np.asarray(y_f, np.float64)
    rms = float(np.sqrt(np.mean(d ** 2)))
    assert 1e-7 < rms < 0.02, f"int8 trunk model rms {rms}"


def test_fused_trunk_pads_window_remainder(rng):
    """nW not divisible by windows_per_cell pads with zero windows."""
    from transformerupscaler_tpu.models.common import WindowBlock
    from transformerupscaler_tpu.ops.pallas.trunk import fused_window_trunk

    key = jax.random.PRNGKey(5)
    win = jax.random.uniform(key, (5, 64, 192), jnp.float32)
    blk = WindowBlock(192, 8, 12, dropout=0.0, dtype=jnp.float32)
    p = blk.init(jax.random.PRNGKey(0), win)
    ref = blk.apply(p, win)
    got = fused_window_trunk(win, [p["params"]], num_heads=12, window_size=8,
                             windows_per_cell=4)
    assert got.shape == win.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_patch_kernels_match_xla(rng):
    from transformerupscaler_tpu.ops.pallas.patch_kernels import (
        fused_patch_embed,
        fused_patch_unembed_add,
    )
    from transformerupscaler_tpu.ops.patch import patch_embed, patch_unembed

    x = jnp.asarray(rng.standard_normal((1, 32, 48, 64)), jnp.float32)
    ke = jnp.asarray(rng.standard_normal((8, 8, 64, 192)) * 0.05, jnp.float32)
    be = jnp.asarray(rng.standard_normal(192), jnp.float32)
    ref = patch_embed(x, ke, be)
    got = fused_patch_embed(x, ke, be)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    ku = jnp.asarray(rng.standard_normal((192, 8, 8, 64)) * 0.05, jnp.float32)
    bu = jnp.asarray(rng.standard_normal(64), jnp.float32)
    tokens = ref
    ref2 = patch_unembed(tokens, ku, bu) + x
    got2 = fused_patch_unembed_add(tokens, x, ku, bu)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_kernels_match_xla(rng):
    """ops/pallas/encoder.py kernels vs the plain conv chain."""
    from transformerupscaler_tpu.ops.pallas.encoder import (
        fused_decoder,
        fused_encoder,
        macro8_to_nhwc,
    )

    feat1 = jnp.asarray(rng.standard_normal((1, 24, 48, 64)), jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    ka = jnp.asarray(rng.standard_normal((5, 5, 64, 12)) * 0.1, jnp.float32)
    ba = jnp.asarray(rng.standard_normal(12) * 0.1, jnp.float32)
    feat_ref = conv2d(feat1, k2, b2, relu=True, auto_macro=False)
    a_ref = conv2d(feat_ref, ka, ba, padding=2, relu=True, auto_macro=False)
    feat, a12 = fused_encoder(feat1, k2, b2, ka, ba, relu_a=True)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat_ref),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(macro8_to_nhwc(a12)),
                               np.asarray(a_ref), rtol=1e-4, atol=2e-5)

    kc = jnp.asarray(rng.standard_normal((7, 7, 64, 12)) * 0.05, jnp.float32)
    bc = jnp.asarray(rng.standard_normal(12) * 0.1, jnp.float32)
    d1_ref = conv2d(feat1, k2, b2, relu=True, auto_macro=False)
    b_ref = conv2d(d1_ref, kc, bc, padding=3, auto_macro=False)
    b12 = macro8_to_nhwc(fused_decoder(feat1, k2, b2, kc, bc))
    np.testing.assert_allclose(np.asarray(b12), np.asarray(b_ref),
                               rtol=1e-4, atol=2e-5)


def _randomize_biases(params, key):
    """Init biases are all zeros — overwrite with random values so
    bias-threading mistakes (tile-vs-repeat orderings in the packed/Pallas
    kernels) actually fail the comparisons."""
    return jax.tree_util.tree_map_with_path(
        lambda p, v: (jax.random.normal(
            jax.random.fold_in(key, hash(str(p)) % (2**31)), v.shape) * 0.1
            if "bias" in str(p[-1]) else v),
        params)


def test_full_model_fast_path_matches_composed_xla():
    """pallas_serve (stream conv/tail/patch kernels) must equal the
    compose_tails XLA path (same composition, different execution)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 48, 64, 3), jnp.float32)
    m_c = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True)
    m_p = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                    pallas_serve=True)
    params = _randomize_biases(m_c.init(key, x, res_out=(72, 96)), key)
    # crop: scale 4 fully composes BOTH Upsampler stages to base resolution
    # in the packed/Pallas path while the compose_tails reference composes
    # per stage — only the documented composed-pad border ring differs.
    for kwargs, crop in (({"res_out": (72, 96)}, 0),
                         ({"upscale_factor": 2, "require_ratio": False}, 0),
                         ({"upscale_factor": 3, "require_ratio": False}, 0),
                         ({"upscale_factor": 4, "require_ratio": False}, 16)):
        y_c = np.asarray(m_c.apply(params, x, **kwargs))
        y_p = np.asarray(m_p.apply(params, x, **kwargs))
        if crop:
            y_c = y_c[:, crop:-crop, crop:-crop]
            y_p = y_p[:, crop:-crop, crop:-crop]
        np.testing.assert_allclose(y_p, y_c, rtol=1e-4, atol=2e-5)


def test_full_model_pallas_int8_composition():
    """pallas_serve composes with int8_serve: int8 convs/tails + Pallas bf16
    patch embed/unembed. Must stay close to the all-XLA int8 path (they
    differ only in embed/unembed quantization, which the Pallas path skips)."""
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (1, 48, 64, 3), jnp.float32)
    m_i = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                    int8_serve=True)
    m_pi = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                     int8_serve=True, pallas_serve=True)
    params = _randomize_biases(m_i.init(key, x, upscale_factor=2), key)
    y_i = m_i.apply(params, x, upscale_factor=2, require_ratio=False)
    y_pi = m_pi.apply(params, x, upscale_factor=2, require_ratio=False)
    # int8 quantization of embed/unembed is the only difference; random-init
    # activations quantize coarsely, so just bound the drift.
    assert np.abs(np.asarray(y_pi) - np.asarray(y_i)).mean() < 0.02


def test_fast_path_falls_back_on_unsupported_scale():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 16, 16, 3), jnp.float32)
    m_c = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True)
    m_p = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                    pallas_serve=True)
    params = m_c.init(key, x, upscale_factor=3)
    y_c = m_c.apply(params, x, upscale_factor=3, require_ratio=False)
    y_p = m_p.apply(params, x, upscale_factor=3, require_ratio=False)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_c),
                               rtol=1e-5, atol=1e-6)


def test_composed_decoder_tail_interior_exact():
    """compose_tails folds decoder_conv2 into the B-branch upsampler; the
    interior must match the exact path (border ring is the documented
    deviation)."""
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (1, 32, 48, 3), jnp.float32)
    m_x = get_model("FastTransformer", dtype=jnp.float32)
    m_c = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True)
    params = m_x.init(key, x, upscale_factor=2)
    y_x = m_x.apply(params, x, upscale_factor=2, require_ratio=False)
    y_c = m_c.apply(params, x, upscale_factor=2, require_ratio=False)
    diff = np.abs(np.asarray(y_x) - np.asarray(y_c))[:, 16:-16, 16:-16]
    assert diff.max() < 3e-5


def test_conv2d_tail_packed_matches_plain(rng):
    """Stride-4 macro-8 tail conv on the packed layout == plain tail conv."""
    from transformerupscaler_tpu.ops.conv import conv2d_tail_packed

    x = jnp.asarray(rng.standard_normal((2, 16, 64, 64)), jnp.float32)
    for kw, co in ((5, 12), (7, 12), (3, 3)):
        k = jnp.asarray(rng.standard_normal((kw, kw, 64, co)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(co), jnp.float32)
        ref = conv2d(x, k, b, padding=(kw - 1) // 2, relu=True,
                     auto_macro=False)
        xp = x.reshape(2, 16, 32, 128)
        got = conv2d_tail_packed(xp, k, b, relu=True)
        got = got.reshape(2, 16, 64, co)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_packed_patch_embed_unembed(rng):
    from transformerupscaler_tpu.ops.patch import (
        patch_embed,
        patch_embed_packed,
        patch_unembed,
        patch_unembed_packed,
    )

    x = jnp.asarray(rng.standard_normal((1, 32, 48, 64)), jnp.float32)
    ke = jnp.asarray(rng.standard_normal((8, 8, 64, 192)) * 0.05, jnp.float32)
    be = jnp.asarray(rng.standard_normal(192), jnp.float32)
    ref = patch_embed(x, ke, be)
    got = patch_embed_packed(x.reshape(1, 32, 24, 128), ke, be)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    ku = jnp.asarray(rng.standard_normal((192, 8, 8, 64)) * 0.05, jnp.float32)
    bu = jnp.asarray(rng.standard_normal(64), jnp.float32)
    ref2 = patch_unembed(ref, ku, bu)
    got2 = patch_unembed_packed(ref, ku, bu)
    np.testing.assert_allclose(
        np.asarray(got2.reshape(1, 32, 48, 64)), np.asarray(ref2),
        rtol=1e-5, atol=1e-5)


def test_full_model_packed_path_matches_composed_xla():
    """packed_serve (all-XLA width-2-packed pipeline) must equal the
    compose_tails path (same composition, packed execution)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 48, 64, 3), jnp.float32)
    m_c = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True)
    m_p = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                    packed_serve=True)
    params = m_c.init(key, x, res_out=(72, 96))
    # Init biases are all zeros — overwrite them with random values so
    # bias-threading mistakes unique to the packed path (repeat-vs-tile
    # orderings in the tail composition) actually fail the comparison.
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (jax.random.normal(
            jax.random.fold_in(key, hash(str(p)) % (2**31)), v.shape) * 0.1
            if "bias" in str(p[-1]) else v),
        params)
    for kwargs in ({"res_out": (72, 96)},
                   {"upscale_factor": 2, "require_ratio": False},
                   {"upscale_factor": 3, "require_ratio": False},
                   {"upscale_factor": 6, "require_ratio": False},
                   {"res_out": (72, 192)},  # 3x squash geometry
                   ):
        y_c = m_c.apply(params, x, **kwargs)
        y_p = m_p.apply(params, x, **kwargs)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_c),
                                   rtol=1e-4, atol=2e-5)

    # The opt-in factored branch-B tail (TUX_FOLD_PRE=0, a measured
    # rejection at model level — tools/fold_ab_bench.py) keeps dec2's exact
    # sequential ordering: interiors must match the composed path; only the
    # fold's single-pad border ring may differ.
    os.environ["TUX_FOLD_PRE"] = "0"
    try:
        for kwargs in ({"upscale_factor": 3, "require_ratio": False},
                       {"upscale_factor": 6, "require_ratio": False}):
            y_c = m_c.apply(params, x, **kwargs)
            y_f = m_p.apply(params, x, **kwargs)
            r = kwargs["upscale_factor"]
            ring = 4 * r
            np.testing.assert_allclose(
                np.asarray(y_f)[:, ring:-ring, ring:-ring],
                np.asarray(y_c)[:, ring:-ring, ring:-ring],
                rtol=1e-4, atol=2e-5)
    finally:
        os.environ.pop("TUX_FOLD_PRE", None)


def test_packed_scale4_matches_exact_interior():
    """Scale 4 fully-composes both Upsampler stages to base resolution
    (models/upsampler.composed_tail_kernel) — the interior must equal the
    EXACT sequential path; only the documented composed-pad border ring may
    deviate."""
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (1, 24, 32, 3), jnp.float32)
    m_e = get_model("FastTransformer", dtype=jnp.float32)
    m_p = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                    packed_serve=True)
    params = m_e.init(key, x, upscale_factor=4)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (jax.random.normal(
            jax.random.fold_in(key, hash(str(p)) % (2**31)), v.shape) * 0.1
            if "bias" in str(p[-1]) else v),
        params)
    y_e = m_e.apply(params, x, upscale_factor=4, require_ratio=False)
    y_p = m_p.apply(params, x, upscale_factor=4, require_ratio=False)
    assert y_p.shape == (1, 96, 128, 3)
    c = 16  # composed pad is 3 base pixels = 12 output pixels at 4x
    np.testing.assert_allclose(np.asarray(y_p)[:, c:-c, c:-c],
                               np.asarray(y_e)[:, c:-c, c:-c],
                               rtol=1e-4, atol=2e-5)


def test_packed_path_falls_back_on_unsupported_geometry():
    # Width 20 is not a multiple of 16 -> the packed gate must not fire; the
    # output equals the compose path bit-for-bit because it IS that path.
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 16, 20, 3), jnp.float32)
    m_c = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True)
    m_p = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                    packed_serve=True)
    params = m_c.init(key, x, upscale_factor=3)
    y_c = m_c.apply(params, x, upscale_factor=3, require_ratio=False)
    y_p = m_p.apply(params, x, upscale_factor=3, require_ratio=False)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_c),
                               rtol=1e-5, atol=1e-6)


def test_residual_packed_path_matches_exact():
    """ResidualTransformer packed_serve must equal the exact path at every
    integer scale (no composed-tail deviation exists in this model — the
    bicubic convs are exact incl. borders via edge padding), and fall back
    for non-integer geometries."""
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    kw = dict(dtype=jnp.float32, token_hw=(2, 2))
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    m_e = get_model("ResidualTransformer", **kw)
    m_p = get_model("ResidualTransformer", packed_serve=True, **kw)
    params = m_e.init(key, x, res_out=(64, 64))
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (jax.random.normal(
            jax.random.fold_in(key, hash(str(p)) % (2**31)), v.shape) * 0.1
            if "bias" in str(p[-1]) else v),
        params)
    for s in (2, 3, 4, 6):
        y_e = m_e.apply(params, x, res_out=(32 * s, 32 * s))
        y_p = m_p.apply(params, x, res_out=(32 * s, 32 * s))
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_e),
                                   rtol=1e-5, atol=1e-5)
    # Non-integer ratio: gate must not fire (identical object path).
    y_e = m_e.apply(params, x, res_out=(48, 48))
    y_p = m_p.apply(params, x, res_out=(48, 48))
    np.testing.assert_array_equal(np.asarray(y_p), np.asarray(y_e))


def test_residual_packed_conv_bicubic_optin_matches_exact(monkeypatch):
    """The measured-rejected block-packed-conv bicubic tail
    (TUX_RESID_BICUBIC=conv) must stay exact so the A/B probe
    (tools/resid_tail_bench.py) keeps comparing like for like."""
    monkeypatch.setenv("TUX_RESID_BICUBIC", "conv")
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)
    kw = dict(dtype=jnp.float32, token_hw=(2, 2))
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    m_e = get_model("ResidualTransformer", **kw)
    m_p = get_model("ResidualTransformer", packed_serve=True, **kw)
    params = m_e.init(key, x, res_out=(96, 96))
    y_e = m_e.apply(params, x, res_out=(96, 96))
    y_p = m_p.apply(params, x, res_out=(96, 96))
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_e),
                               rtol=1e-5, atol=1e-5)


def test_bicubic_upscale_conv_packed_exact(rng):
    from transformerupscaler_tpu.ops.pixel_shuffle import pixel_shuffle
    from transformerupscaler_tpu.ops.resize import (
        bicubic_upscale_conv_packed,
        interpolate_bicubic,
    )

    for r in (2, 3, 4, 6):
        x = jnp.asarray(rng.random((2, 12, 16, 3)), jnp.float32)
        want = interpolate_bicubic(x, (12 * r, 16 * r))
        got = pixel_shuffle(bicubic_upscale_conv_packed(x, r), r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_fused_trunk_v2_chunked_matches_xla_blocks(rng):
    """TUX_TRUNK_CHUNK=1 (per-pair chunked layer bodies) is the same
    reduction set as the paired kernel — must match the XLA block loop."""
    import os

    from transformerupscaler_tpu.models.common import WindowBlock
    from transformerupscaler_tpu.ops.pallas.trunk2 import fused_window_trunk_v2

    key = jax.random.PRNGKey(13)
    win = jax.random.uniform(key, (10, 64, 192), jnp.float32)
    blocks = [WindowBlock(192, 8, 12, dropout=0.0, dtype=jnp.float32)
              for _ in range(2)]
    params, outs = [], win
    for i, blk in enumerate(blocks):
        p = blk.init(jax.random.PRNGKey(i), outs)
        outs = blk.apply(p, outs)
        params.append(p["params"])

    os.environ["TUX_TRUNK_CHUNK"] = "1"
    try:
        for wpc in (4, 8):
            got = fused_window_trunk_v2(win, params, num_heads=12,
                                        window_size=8,
                                        windows_per_cell=wpc, pair=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(outs),
                                       rtol=2e-4, atol=2e-5)
    finally:
        del os.environ["TUX_TRUNK_CHUNK"]
