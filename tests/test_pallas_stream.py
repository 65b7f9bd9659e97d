"""Row-streamed Pallas serving kernels (ops/pallas/stream.py) vs the XLA
packed formulations (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from transformerupscaler_tpu.ops.conv import (
    conv2d_packed_raw,
    conv2d_tail_packed,
)
from transformerupscaler_tpu.ops.patch import (
    patch_embed_packed,
    patch_unembed_packed,
)
from transformerupscaler_tpu.ops.pallas.stream import (
    conv3x3_packed_stream,
    deinterleave4,
    embed_stream,
    interleave4,
    tail_macro8_stream,
    unembed_combine_stream,
)


def _packed(rng, b=1, h=16, w=64, c=64):
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    return jnp.asarray(x.reshape(b, h, w // 2, 2 * c))


def test_interleave4_roundtrip(rng):
    xp = _packed(rng)
    xt = deinterleave4(xp)
    np.testing.assert_array_equal(np.asarray(interleave4(xt)), np.asarray(xp))


def test_conv3x3_stream_matches_packed_raw(rng):
    xp = _packed(rng)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    want = conv2d_packed_raw(xp, k, b, relu=True)
    got = conv3x3_packed_stream(xp, k, b, relu=True, rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-5)


def test_conv3x3_int8_stream_matches_xla_int8(rng):
    from transformerupscaler_tpu.ops.conv import conv2d_packed_int8
    from transformerupscaler_tpu.ops.pallas.stream import (
        conv3x3_packed_int8_stream,
    )
    from transformerupscaler_tpu.ops.quant import quantize_act_ch

    x = jnp.asarray(np.abs(rng.standard_normal((1, 16, 32, 128)))
                    .astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    scl = jnp.asarray(np.abs(rng.standard_normal(64)).astype(np.float32)
                      * 0.01 + 1e-3)
    q, _ = quantize_act_ch(x, jnp.tile(scl, 2))
    want = conv2d_packed_int8(q, k, scl, b, relu=True,
                              out_dtype=jnp.float32)
    got = conv3x3_packed_int8_stream(q, k, scl, b, relu=True,
                                     out_dtype=jnp.float32, rows=8,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv2d_packed_dots_matches_raw(rng):
    from transformerupscaler_tpu.ops.conv import (
        conv2d_packed_dots,
        conv2d_packed_raw,
    )

    x = jnp.asarray(rng.standard_normal((1, 12, 16, 6)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 64)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    want = conv2d_packed_raw(x, k, b, relu=True)
    got = conv2d_packed_dots(x, k, b, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    from transformerupscaler_tpu.ops.pallas.stream import interleave4

    got_d = conv2d_packed_dots(x, k, b, relu=True, deint_out=True)
    np.testing.assert_allclose(np.asarray(interleave4(got_d)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_tail_macro8_stream_matches_packed(rng):
    xp = _packed(rng, h=16, w=64)
    k = jnp.asarray(rng.standard_normal((5, 5, 64, 12)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(12).astype(np.float32))
    want = conv2d_tail_packed(xp, k, b, relu=True, block=8)
    got = tail_macro8_stream(deinterleave4(xp), k, b, relu=True, rows=8,
                             interpret=True)
    np.testing.assert_allclose(
        np.asarray(got).reshape(np.asarray(want).shape), np.asarray(want),
        rtol=1e-4, atol=2e-5)


def test_conv3x3_deint_stream_matches_packed_raw(rng):
    from transformerupscaler_tpu.ops.pallas.stream import (
        conv3x3_deint_stream,
        interleave4,
    )

    xp = _packed(rng)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    want = conv2d_packed_raw(xp, k, b, relu=True)
    got = conv3x3_deint_stream(deinterleave4(xp), k, b, relu=True, rows=8,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(interleave4(got)), np.asarray(want),
                               rtol=1e-4, atol=2e-5)


def test_conv3x3_tail_stream_matches_unfused(rng):
    from transformerupscaler_tpu.ops.pallas.stream import conv3x3_tail_stream

    xp = _packed(rng, h=16, w=64)
    kc = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.1)
    bc = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    for kh, tail_relu in ((7, False), (5, True), (3, False)):
        kt = jnp.asarray(rng.standard_normal((kh, kh, 64, 12))
                         .astype(np.float32) * 0.1)
        bt = jnp.asarray(rng.standard_normal(12).astype(np.float32))
        dec = conv2d_packed_raw(xp, kc, bc, relu=True)
        want = conv2d_tail_packed(dec, kt, bt, relu=tail_relu, block=8)
        got = conv3x3_tail_stream(deinterleave4(xp), kc, bc, kt, bt,
                                  tail_relu=tail_relu, rows=8,
                                  interpret=True)
        np.testing.assert_allclose(
            np.asarray(got).reshape(np.asarray(want).shape),
            np.asarray(want), rtol=1e-4, atol=2e-5)


def test_conv3x3_tail_emit_stream_matches_unfused(rng):
    from transformerupscaler_tpu.ops.pallas.stream import (
        conv3x3_tail_emit_stream,
        interleave4,
    )

    xp = _packed(rng, h=16, w=64)
    kc = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.1)
    bc = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    kt = jnp.asarray(rng.standard_normal((5, 5, 64, 12)).astype(np.float32) * 0.1)
    bt = jnp.asarray(rng.standard_normal(12).astype(np.float32))
    feat = conv2d_packed_raw(xp, kc, bc, relu=True)
    want = conv2d_tail_packed(feat, kt, bt, relu=True, block=8)
    got, featd = conv3x3_tail_emit_stream(deinterleave4(xp), kc, bc, kt, bt,
                                          rows=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got).reshape(np.asarray(want).shape),
        np.asarray(want), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(interleave4(featd)),
                               np.asarray(feat), rtol=1e-4, atol=2e-5)


def test_unembed_combine_stream_matches_xla(rng):
    ht, wt, d, c, ps = 2, 8, 64, 64, 8
    tokens = jnp.asarray(rng.standard_normal((1, ht, wt, d)).astype(np.float32))
    ku = jnp.asarray(rng.standard_normal((d, ps, ps, c)).astype(np.float32) * 0.05)
    bu = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    featp = _packed(rng, h=ht * ps, w=wt * ps)
    want = patch_unembed_packed(tokens, ku, bu) + featp
    got = unembed_combine_stream(tokens, deinterleave4(featp), ku, bu,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(interleave4(got)), np.asarray(want),
                               rtol=1e-4, atol=2e-5)


def test_unembed_combine_stream_relu(rng):
    ht, wt, d, c, ps = 1, 4, 32, 64, 8
    tokens = jnp.asarray(rng.standard_normal((1, ht, wt, d)).astype(np.float32))
    ku = jnp.asarray(rng.standard_normal((d, ps, ps, c)).astype(np.float32) * 0.05)
    featp = _packed(rng, h=ht * ps, w=wt * ps)
    want = jnp.maximum(patch_unembed_packed(tokens, ku, None) + featp, 0.0)
    got = unembed_combine_stream(tokens, deinterleave4(featp), ku, None,
                                 relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(interleave4(got)), np.asarray(want),
                               rtol=1e-4, atol=2e-5)


def test_embed_stream_matches_xla(rng):
    ht, wt, d, c, ps = 2, 8, 96, 64, 8
    featp = _packed(rng, h=ht * ps, w=wt * ps)
    ke = jnp.asarray(rng.standard_normal((ps, ps, c, d)).astype(np.float32) * 0.05)
    be = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    want = patch_embed_packed(featp, ke, be)
    got = embed_stream(deinterleave4(featp), ke, be, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-5)


def test_tail_macro8_stream_int8_matches_xla_int8(rng):
    from transformerupscaler_tpu.ops.conv import conv2d_tail_packed_int8
    from transformerupscaler_tpu.ops.pallas.stream import (
        tail_macro8_stream_int8,
    )
    from transformerupscaler_tpu.ops.quant import quantize_act_ch

    x = jnp.asarray(np.abs(rng.standard_normal((1, 16, 32, 128)))
                    .astype(np.float32))
    k = jnp.asarray(rng.standard_normal((7, 7, 64, 12)).astype(np.float32)
                    * 0.1)
    b = jnp.asarray(rng.standard_normal(12).astype(np.float32))
    scl = jnp.asarray(np.abs(rng.standard_normal(64)).astype(np.float32)
                      * 0.01 + 1e-3)
    q, _ = quantize_act_ch(x, jnp.tile(scl, 2))
    want = conv2d_tail_packed_int8(q, k, scl, b, relu=True,
                                   out_dtype=jnp.float32, block=8)
    got = tail_macro8_stream_int8(deinterleave4(q), k, scl, b, relu=True,
                                  out_dtype=jnp.float32, rows=8,
                                  interpret=True)
    np.testing.assert_allclose(
        np.asarray(got).reshape(np.asarray(want).shape), np.asarray(want),
        rtol=1e-4, atol=1e-4)


def test_conv3x3_deint_stream_int8_emit(rng):
    """out_scale epilogue == bf16 conv followed by quantize_act_ch, up to
    the multiply-by-reciprocal rounding at exact ties (<=1 quantum)."""
    from transformerupscaler_tpu.ops.pallas.stream import (
        conv3x3_deint_stream,
    )
    from transformerupscaler_tpu.ops.quant import quantize_act_ch

    xp = _packed(rng)
    xd = deinterleave4(xp)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32)
                    * 0.1)
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    scl = jnp.asarray(np.abs(rng.standard_normal(64)).astype(np.float32)
                      * 0.02 + 1e-3)
    y = conv3x3_deint_stream(xd, k, b, relu=True, rows=8, interpret=True)
    want, _ = quantize_act_ch(y, jnp.tile(scl, 2))
    got = conv3x3_deint_stream(xd, k, b, relu=True, rows=8,
                               out_scale=scl, interpret=True)
    assert got.dtype == jnp.int8
    d = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert d.max() <= 1
    assert (d != 0).mean() < 1e-3


def test_embed_stream_int8_dequant(rng):
    from transformerupscaler_tpu.ops.quant import quantize_act_ch

    feat = jnp.asarray(np.abs(rng.standard_normal((1, 16, 32, 128)))
                       .astype(np.float32))
    k = jnp.asarray(rng.standard_normal((8, 8, 64, 48)).astype(np.float32)
                    * 0.1)
    b = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    scl = jnp.asarray(np.abs(rng.standard_normal(64)).astype(np.float32)
                      * 0.01 + 1e-3)
    q, _ = quantize_act_ch(feat, jnp.tile(scl, 2))
    deq = (q.astype(jnp.float32) * jnp.tile(scl, 2)).astype(jnp.float32)
    want = patch_embed_packed(deq, k, b)
    got = embed_stream(deinterleave4(q), k, b, in_scale=scl,
                       out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_unembed_combine_stream_feat_scale(rng):
    from transformerupscaler_tpu.ops.quant import quantize_act_ch

    feat = jnp.asarray(np.abs(rng.standard_normal((1, 16, 32, 128)))
                       .astype(np.float32))
    tokens = jnp.asarray(rng.standard_normal((1, 2, 8, 48))
                         .astype(np.float32))
    k = jnp.asarray(rng.standard_normal((48, 8, 8, 64)).astype(np.float32)
                    * 0.1)
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    scl = jnp.asarray(np.abs(rng.standard_normal(64)).astype(np.float32)
                      * 0.01 + 1e-3)
    q, _ = quantize_act_ch(feat, jnp.tile(scl, 2))
    deq = q.astype(jnp.float32) * jnp.tile(scl, 2)
    want = patch_unembed_packed(tokens, k, b) + deq
    got = unembed_combine_stream(tokens, deinterleave4(q), k, b,
                                 feat_scale=scl, interpret=True)
    np.testing.assert_allclose(np.asarray(interleave4(got)),
                               np.asarray(want), rtol=1e-4, atol=1e-4)


def test_global_mha_matches_xla(rng):
    """ops/pallas/gmha.global_mha == the XLA multihead_attention core at a
    non-128-multiple token count (exercises the pad/kmask path)."""
    import jax
    from transformerupscaler_tpu.ops.attention import multihead_attention
    from transformerupscaler_tpu.ops.pallas.gmha import global_mha

    b, n, c, heads = 1, 200, 64, 4
    x = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    in_w = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32)
                       * 0.1)
    in_b = jnp.asarray(rng.standard_normal(3 * c).astype(np.float32) * 0.1)
    out_w = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.1)
    out_b = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    want = multihead_attention(x, in_w, in_b, out_w, out_b, num_heads=heads)
    got = multihead_attention(x, in_w, in_b, out_w, out_b, num_heads=heads,
                              impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_residual_attn_impl_pallas_matches_xla(rng):
    """ResidualTransformer with attn_impl routed through the Pallas global
    MHA matches the XLA path at f32 (packed serving geometry)."""
    import jax
    from transformerupscaler_tpu.registry import get_model

    key = jax.random.PRNGKey(0)
    # token_hw must match the input geometry: 64x64 -> /2 -> /8 = (4, 4)
    kw = dict(dtype=jnp.float32, token_hw=(4, 4), packed_serve=True)
    x = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32)
    m_x = get_model("ResidualTransformer", **kw)
    m_p = get_model("ResidualTransformer", **kw, attn_impl="fused2")
    params = m_x.init(key, x, res_out=(128, 128))
    want = np.asarray(m_x.apply(params, x, res_out=(128, 128)))
    got = np.asarray(m_p.apply(params, x, res_out=(128, 128)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_residual_pallas_serve_matches_xla(rng):
    """ResidualTransformer pallas_serve (dots conv1 + stream conv2) matches
    the all-XLA packed path at f32."""
    import jax
    from transformerupscaler_tpu.registry import get_model

    key = jax.random.PRNGKey(1)
    kw = dict(dtype=jnp.float32, token_hw=(4, 4), packed_serve=True)
    x = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32)
    m_x = get_model("ResidualTransformer", **kw)
    m_p = get_model("ResidualTransformer", **kw, pallas_serve=True)
    params = m_x.init(key, x, res_out=(128, 128))
    want = np.asarray(m_x.apply(params, x, res_out=(128, 128)))
    got = np.asarray(m_p.apply(params, x, res_out=(128, 128)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_window_pallas_serve_matches_xla(rng):
    """WindowTransformer pallas_serve encoder matches the plain path."""
    import jax
    from transformerupscaler_tpu.registry import get_model

    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (1, 48, 64, 3), jnp.float32)
    m_x = get_model("WindowTransformer", dtype=jnp.float32)
    m_p = get_model("WindowTransformer", dtype=jnp.float32,
                    pallas_serve=True)
    params = m_x.init(key, x, res_out=(96, 128))
    want = np.asarray(m_x.apply(params, x, res_out=(96, 128)))
    got = np.asarray(m_p.apply(params, x, res_out=(96, 128)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_tail_macro8_stream_f32_out_dtype(rng):
    """out_dtype=f32 emits f32 and matches the bf16-output path's values
    (compute is identical bf16 GEMMs + f32 accumulation; only the final
    store rounds) — the TUX_F32_TAIL / serve_quality output stage."""
    xp = _packed(rng, h=16, w=64)
    k = jnp.asarray(rng.standard_normal((5, 5, 64, 12)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(12).astype(np.float32))
    xt = deinterleave4(xp).astype(jnp.bfloat16)
    got_bf = tail_macro8_stream(xt, k, b, relu=True, rows=8, interpret=True)
    got_f32 = tail_macro8_stream(xt, k, b, relu=True, rows=8,
                                 out_dtype=jnp.float32, interpret=True)
    assert got_bf.dtype == jnp.bfloat16
    assert got_f32.dtype == jnp.float32
    # f32 output = the same pre-store values, so bf16(f32_out) == bf16_out.
    np.testing.assert_array_equal(
        np.asarray(got_f32.astype(jnp.bfloat16).astype(jnp.float32)),
        np.asarray(got_bf.astype(jnp.float32)))


def test_conv3x3_tail_stream_f32_out_dtype(rng):
    """The fused conv+tail kernel honors out_dtype (ADVICE r3: TUX_F32_TAIL
    was silently ignored on the TUX_FUSE_STREAM path)."""
    from transformerupscaler_tpu.ops.pallas.stream import (
        conv3x3_tail_emit_stream,
        conv3x3_tail_stream,
    )

    xp = _packed(rng, h=16, w=64)
    kc = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.1)
    bc = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    kt = jnp.asarray(rng.standard_normal((5, 5, 64, 12)).astype(np.float32) * 0.1)
    xt = deinterleave4(xp).astype(jnp.bfloat16)
    out = conv3x3_tail_stream(xt, kc, bc, kt, rows=8,
                              out_dtype=jnp.float32, interpret=True)
    assert out.dtype == jnp.float32
    out2, feat = conv3x3_tail_emit_stream(xt, kc, bc, kt, rows=8,
                                          out_dtype=jnp.float32,
                                          interpret=True)
    assert out2.dtype == jnp.float32 and feat.dtype == jnp.bfloat16


def test_stream_rows_fallback_prefers_swept_sizes():
    """H not divisible by the preferred row count falls back through the
    other swept sizes, not straight to the slowest 8 (ADVICE r3)."""
    rng = np.random.default_rng(5)
    xp = jnp.asarray(rng.standard_normal((1, 24, 32, 128)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((7, 7, 64, 12)).astype(np.float32) * 0.1)
    # h=24: kh>=7 prefers rows=16 which doesn't divide 24 -> should pick 24.
    want = conv2d_tail_packed(xp, k, None, block=8)
    got = tail_macro8_stream(deinterleave4(xp), k, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got).reshape(np.asarray(want).shape), np.asarray(want),
        rtol=1e-4, atol=2e-5)


def test_conv2d_packed_dots_deint_hi_lo_exact(rng):
    """hi/lo-split conv1 matches the f32 conv to ~2^-16 relative (the
    dropped lo*lo term) — far tighter than one bf16 rounding."""
    from transformerupscaler_tpu.ops.conv import (
        conv2d_packed_dots_deint,
        conv2d_packed_raw,
    )
    from transformerupscaler_tpu.ops.pallas.stream import interleave4

    x = rng.standard_normal((1, 16, 32, 3)).astype(np.float32)
    xp = jnp.asarray(x.reshape(1, 16, 16, 6))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 64)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    want = np.asarray(conv2d_packed_raw(xp, k, b, relu=True), np.float32)
    got = np.asarray(interleave4(
        conv2d_packed_dots_deint(xp, k, b, relu=True, hi_lo=True,
                                 out_dtype=jnp.float32)), np.float32)
    # hi/lo error ~2^-16 relative; one bf16 rounding would be ~2^-8.
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    err_hilo = np.max(np.abs(got - want))
    bf16_once = np.asarray(
        jnp.asarray(want).astype(jnp.bfloat16).astype(jnp.float32))
    err_bf16 = np.max(np.abs(bf16_once - want))
    assert err_hilo < err_bf16 / 8, (err_hilo, err_bf16)


def test_conv2d_packed_dots_deint_k_hi_lo_uint8_exact(rng):
    """serve_quality v2 conv1: exact-uint8 input (bf16 holds integers
    <= 255 exactly) + kernel-only hi/lo split with the 1/255 fold
    (pre_scale) matches the f32 conv on the [0,1] image to ~2^-17
    relative — same fidelity as the input hi/lo split without its f32
    im2col (9.65 vs 0.84 ms at 720p, tools/r4_model_bench.py)."""
    from transformerupscaler_tpu.ops.conv import (
        conv2d_packed_dots_deint,
        conv2d_packed_raw,
    )
    from transformerupscaler_tpu.ops.pallas.stream import interleave4

    u8 = rng.integers(0, 256, (1, 16, 32, 3)).astype(np.uint8)
    x = u8.astype(np.float32) / 255.0  # the engine boundary's exact grid
    xp = jnp.asarray(x.reshape(1, 16, 16, 6))
    xq = jnp.asarray((x * 255.0).reshape(1, 16, 16, 6)).astype(jnp.bfloat16)
    # bf16(x*255) must be EXACTLY the uint8 integers.
    np.testing.assert_array_equal(
        np.asarray(xq, np.float32), u8.reshape(1, 16, 16, 6).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 64)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    want = np.asarray(conv2d_packed_raw(xp, k, b, relu=True), np.float32)
    got = np.asarray(interleave4(
        conv2d_packed_dots_deint(xq, k, b, relu=True, k_hi_lo=True,
                                 pre_scale=1.0 / 255.0,
                                 out_dtype=jnp.float32)), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    err = np.max(np.abs(got - want))
    bf16_once = np.asarray(
        jnp.asarray(want).astype(jnp.bfloat16).astype(jnp.float32))
    err_bf16 = np.max(np.abs(bf16_once - want))
    assert err < err_bf16 / 8, (err, err_bf16)


@pytest.mark.parametrize("kh,cm,co", [(5, 12, 12), (5, 12, 48), (3, 27, 27)])
def test_tail_finish_stream_matches_sequential(rng, kh, cm, co):
    """Fused split-B tail (mid conv + in-VMEM finish) matches the
    sequential two-conv zero-pad form everywhere INCLUDING the border
    (the kernel zeroes out-of-image mid rows exactly like the finish's
    own zero-pad)."""
    from transformerupscaler_tpu.ops.conv import conv2d
    from transformerupscaler_tpu.ops.pallas.stream import (
        deinterleave4,
        tail_finish_stream,
    )

    B, H, W, C = 1, 24, 32, 64
    xp = jnp.asarray(rng.standard_normal((B, H, W // 2, 2 * C))
                     .astype(np.float32)).astype(jnp.bfloat16)
    km = jnp.asarray(rng.standard_normal((kh, kh, C, cm)).astype(np.float32)
                     * 0.1)
    bm = jnp.asarray(rng.standard_normal(cm).astype(np.float32) * 0.1)
    kf = jnp.asarray(rng.standard_normal((3, 3, cm, co)).astype(np.float32)
                     * 0.1)
    bf = jnp.asarray(rng.standard_normal(co).astype(np.float32) * 0.1)

    xn = np.asarray(xp, np.float32).reshape(B, H, W, C)
    mid = conv2d(jnp.asarray(xn), km, bm, padding=(kh - 1) // 2)
    want = np.asarray(conv2d(mid, kf, bf, padding=1), np.float32)

    got = tail_finish_stream(deinterleave4(xp), km, bm, kf, bf,
                             interpret=True)
    got = np.asarray(got, np.float32).reshape(want.shape)
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)
    # f32 out_dtype path (serve_quality interplay); hi_lo_fin (the
    # default) hi/los the f32 mid AND the f32 finish weights, so it must
    # sit closer to the f32 sequential reference than the plain-bf16
    # finish.
    got32 = tail_finish_stream(deinterleave4(xp), km, bm, kf, bf,
                               out_dtype=jnp.float32, interpret=True)
    assert got32.dtype == jnp.float32
    lo = tail_finish_stream(deinterleave4(xp), km, bm, kf, bf,
                            out_dtype=jnp.float32, hi_lo_fin=False,
                            interpret=True)
    full = tail_finish_stream(deinterleave4(xp), km, bm, kf, bf,
                              out_dtype=jnp.float32, hi_lo_fin="full",
                              interpret=True)
    e_hi = np.abs(np.asarray(got32, np.float32).reshape(want.shape) - want)
    e_lo = np.abs(np.asarray(lo, np.float32).reshape(want.shape) - want)
    e_full = np.abs(np.asarray(full, np.float32).reshape(want.shape) - want)
    assert float(e_hi.mean()) <= float(e_lo.mean()) * 1.01, (
        e_hi.mean(), e_lo.mean())
    # "full" (K-concat hi/lo of BOTH finish operands) must beat "wf"
    # (exact weights, bf16 mid): the mid's rounding is the residual term.
    assert float(e_full.mean()) <= float(e_hi.mean()) * 1.01, (
        e_full.mean(), e_hi.mean())


def test_conv1_dots_stream_matches_dots_deint(rng):
    """Round-5 streaming conv1 (XLA tap expansion + one-dot Pallas row
    stream) is BIT-EXACT vs the shipping conv2d_packed_dots_deint: same
    reduction values (the j-unused taps of the (108, 512) packed weight
    are exact zeros) and the same round-to-dt-then-bias-then-relu
    epilogue order."""
    from transformerupscaler_tpu.ops.conv import conv2d_packed_dots_deint
    from transformerupscaler_tpu.ops.pallas.stream import conv1_dots_stream

    x = jnp.asarray(rng.standard_normal((1, 16, 32, 6)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 64)).astype(np.float32)
                    * 0.1)
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    for dt in (jnp.float32, jnp.bfloat16):
        want = conv2d_packed_dots_deint(x.astype(dt), k, b, relu=True)
        got = conv1_dots_stream(x.astype(dt), k, b, relu=True, rows=8,
                                interpret=True)
        assert got.dtype == want.dtype and got.shape == want.shape
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32))
    # rows fallback (h=16 % rows=24 != 0) and no-bias/no-relu form.
    want = conv2d_packed_dots_deint(x, k, None)
    got = conv1_dots_stream(x, k, None, rows=24, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv1_flat_stream_matches_dots_deint(rng):
    """The archived v2 streaming conv1 (in-kernel operand assembly from
    flat rows) — dead on real TPUs (Mosaic "unsupported shape cast",
    ops/pallas/README.md) but kept interpret-mode correct as the
    executable record of the closed lead."""
    from transformerupscaler_tpu.ops.conv import conv2d_packed_dots_deint
    from transformerupscaler_tpu.ops.pallas.stream import conv1_flat_stream

    x = jnp.asarray(rng.standard_normal((1, 24, 32, 6)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 64)).astype(np.float32)
                    * 0.1)
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    want = conv2d_packed_dots_deint(x, k, b, relu=True)
    got = conv1_flat_stream(x, k, b, relu=True, rows=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))
