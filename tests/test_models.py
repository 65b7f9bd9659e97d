"""Model-level tests: forward shapes, parameter-count parity with the
reference's measured sizes (SURVEY.md §6: Window 2,763,651 / Residual
3,210,051 / Fast 6,447,379), and behavioral invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transformerupscaler_tpu as tux


def _param_count(model, x, **kw):
    shapes = jax.eval_shape(lambda r, v: model.init(r, v, **kw),
                            jax.random.PRNGKey(0), x)
    return sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))


def _spec(h, w, c=3, b=1):
    return jax.ShapeDtypeStruct((b, h, w, c), jnp.float32)


def test_param_counts_match_reference():
    fast = tux.get_model("FastTransformer")
    window = tux.get_model("WindowTransformer")
    residual = tux.get_model("ResidualTransformer")
    bicubic = tux.get_model("BicubicInterpolation")
    assert _param_count(fast, _spec(96, 96), upscale_factor=2) == 6_447_379
    assert _param_count(window, _spec(96, 96)) == 2_763_651
    assert _param_count(residual, _spec(720, 1280)) == 3_210_051
    assert _param_count(bicubic, _spec(96, 96)) == 0


def test_registry_lists_all_variants():
    assert set(tux.list_models()) >= {
        "BicubicInterpolation", "FastTransformer",
        "ResidualTransformer", "WindowTransformer",
    }


@pytest.mark.parametrize("scale", [2, 3, 4, 6])
def test_fast_transformer_scales(scale):
    # Reference smoke block: random 100x100 at each scale
    # (FastTransformer/model.py:330-334 uses 6x).
    model = tux.get_model("FastTransformer")
    x = jnp.zeros((1, 40, 40, 3), jnp.float32)
    params = jax.eval_shape(
        lambda r, v: model.init(r, v, upscale_factor=scale),
        jax.random.PRNGKey(0), x)
    out = jax.eval_shape(
        lambda p, v: model.apply(p, v, upscale_factor=scale), params, x)
    assert out.shape == (1, 40 * scale, 40 * scale, 3)


def test_fast_transformer_forward_runs():
    model = tux.get_model("FastTransformer")
    x = jnp.asarray(np.random.default_rng(0).random((1, 40, 48, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, upscale_factor=2)
    out = model.apply(params, x, upscale_factor=2)
    assert out.shape == (1, 80, 96, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_fast_transformer_res_out_squash():
    # res_out path: scale = ceil(1080/720) = 2, then squash 80x96 -> 60x72.
    model = tux.get_model("FastTransformer")
    x = jnp.zeros((1, 40, 48, 3), jnp.float32)
    params = jax.eval_shape(
        lambda r, v: model.init(r, v, res_out=(60, 72), require_ratio=True),
        jax.random.PRNGKey(0), x)
    out = jax.eval_shape(
        lambda p, v: model.apply(p, v, res_out=(60, 72), require_ratio=True),
        params, x)
    assert out.shape == (1, 60, 72, 3)


def test_fast_transformer_identity_squash_skipped():
    """res_out == out_hw makes the ratio-bug squash an identity resize —
    the model must SKIP it (bit-exact; at x6 the identity resize_shuffled
    is ~1.2 TMAC of waste), while non-multiple geometries still squash
    (reference FastTransformer/model.py:322-325)."""
    import transformerupscaler_tpu.models.fast_transformer as ft

    model = tux.get_model("FastTransformer")
    x = jnp.asarray(np.random.default_rng(1).random((1, 40, 48, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, upscale_factor=2)
    calls = []
    orig = ft.resize_shuffled

    def spy(*a, **kw):
        calls.append(a[2] if len(a) > 2 else kw.get("out_hw"))
        return orig(*a, **kw)

    ft.resize_shuffled = spy
    try:
        # Exact multiple: (80, 96) == out_hw -> no squash, and identical to
        # the never-squash (require_ratio=False) output.
        out = model.apply(params, x, res_out=(80, 96), require_ratio=True)
        assert not calls
        ref = model.apply(params, x, res_out=(80, 96), require_ratio=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        # Non-multiple: still squashes through resize_shuffled.
        out2 = model.apply(params, x, res_out=(60, 72), require_ratio=True)
        assert calls and out2.shape == (1, 60, 72, 3)
    finally:
        ft.resize_shuffled = orig


def test_window_transformer_forward_runs():
    model = tux.get_model("WindowTransformer")
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 96, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, res_out=(96, 144))
    out = model.apply(params, x, res_out=(96, 144))
    assert out.shape == (1, 96, 144, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_window_transformer_odd_sizes():
    # Non-divisible extents: downsample -> floor-crop patch grid -> crop-to-min
    # skip (reference WindowTransformer/model.py:289-294).
    model = tux.get_model("WindowTransformer")
    x = jnp.zeros((1, 50, 70, 3), jnp.float32)
    params = jax.eval_shape(lambda r, v: model.init(r, v, res_out=(100, 140)),
                            jax.random.PRNGKey(0), x)
    out = jax.eval_shape(lambda p, v: model.apply(p, v, res_out=(100, 140)),
                         params, x)
    assert out.shape == (1, 100, 140, 3)


def test_residual_transformer_shape():
    model = tux.get_model("ResidualTransformer")
    x = jnp.zeros((1, 720, 1280, 3), jnp.float32)
    params = jax.eval_shape(lambda r, v: model.init(r, v), jax.random.PRNGKey(0), x)
    out = jax.eval_shape(lambda p, v: model.apply(p, v), params, x)
    assert out.shape == (1, 1080, 1920, 3)


def test_residual_transformer_rejects_wrong_geometry():
    model = tux.get_model("ResidualTransformer")
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    with pytest.raises(ValueError, match="pos_embed is baked"):
        jax.eval_shape(lambda r, v: model.init(r, v), jax.random.PRNGKey(0), x)


def test_dropout_only_active_when_not_deterministic():
    model = tux.get_model("FastTransformer")
    x = jnp.asarray(np.random.default_rng(1).random((1, 16, 16, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, upscale_factor=2)
    a = model.apply(params, x, upscale_factor=2, deterministic=True)
    b = model.apply(params, x, upscale_factor=2, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = model.apply(params, x, upscale_factor=2, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_fast_transformer_serve_quality_mode():
    """serve_quality: exact-uint8 k_hi_lo conv1, f32 tails, HIGH squash.
    Gate: runs the packed pallas path on an f32 input and lands at least as
    close to the exact f32 path as the plain bf16 headline config
    (interior; the compose ring is a shared deviation)."""
    import jax
    import jax.numpy as jnp

    from transformerupscaler_tpu.registry import get_model

    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (1, 24, 32, 3), jnp.float32)
    res_out = (36, 48)  # real squash (3/4 of 2x), like the headline
    exact = get_model("FastTransformer", dtype=jnp.float32)
    params = exact.init(key, x, res_out=res_out)
    y_e = np.asarray(exact.apply(params, x, res_out=res_out), np.float32)

    head = get_model("FastTransformer", dtype=jnp.bfloat16,
                     compose_tails=True, pallas_serve=True)
    y_h = np.asarray(head.apply(params, x.astype(jnp.bfloat16),
                                res_out=res_out), np.float32)
    qual = get_model("FastTransformer", dtype=jnp.bfloat16,
                     compose_tails=True, pallas_serve=True,
                     serve_quality=True)
    y_q = np.asarray(qual.apply(params, x, res_out=res_out), np.float32)

    def mse(a, b, c=8):
        return np.mean((a[:, c:-c, c:-c] - b[:, c:-c, c:-c]) ** 2)

    assert y_q.shape == y_e.shape
    assert mse(y_q, y_e) <= mse(y_h, y_e) * 1.05, (mse(y_q, y_e),
                                                   mse(y_h, y_e))


def test_fast_transformer_split_tail_matches():
    """split_tail=True (split branch-B tail) matches the composed fold
    (split_tail=False) on the interior — the ring may differ (two
    zero-pads instead of one, same deviation class as compose_tails)."""
    import jax
    import jax.numpy as jnp

    from transformerupscaler_tpu.registry import get_model

    key = jax.random.PRNGKey(5)
    x = jax.random.uniform(key, (1, 24, 32, 3), jnp.bfloat16)
    kw = dict(dtype=jnp.bfloat16, compose_tails=True, pallas_serve=True)
    composed = get_model("FastTransformer", split_tail=False, **kw)
    split_m = get_model("FastTransformer", split_tail=True, **kw)
    params = composed.init(key, x, upscale_factor=2)
    for scale in (2, 4):
        base = np.asarray(
            composed.apply(params, x, upscale_factor=scale), np.float32)
        split = np.asarray(
            split_m.apply(params, x, upscale_factor=scale), np.float32)
        c = 4 * scale
        np.testing.assert_allclose(
            split[:, c:-c, c:-c], base[:, c:-c, c:-c], atol=0.02, rtol=0.02,
            err_msg=f"scale {scale}")


def test_fast_transformer_split_tail_env_overrides_config(monkeypatch):
    """The TUX_SPLIT_TAIL debug env var still overrides the config field
    (both directions), and the auto default (None) splits on the fast
    path at x2 — asserted via bit-identity with the explicit forms."""
    import jax
    import jax.numpy as jnp

    from transformerupscaler_tpu.registry import get_model

    key = jax.random.PRNGKey(6)
    x = jax.random.uniform(key, (1, 16, 32, 3), jnp.bfloat16)
    kw = dict(dtype=jnp.bfloat16, compose_tails=True, pallas_serve=True)
    params = get_model("FastTransformer", **kw).init(key, x,
                                                     upscale_factor=2)

    def run(model):
        return np.asarray(model.apply(params, x, upscale_factor=2),
                          np.float32)

    y_split = run(get_model("FastTransformer", split_tail=True, **kw))
    y_fold = run(get_model("FastTransformer", split_tail=False, **kw))
    assert not np.array_equal(y_split, y_fold)  # ring differs by design

    # auto (None) on the fast path at x2 = split (measured default).
    np.testing.assert_array_equal(run(get_model("FastTransformer", **kw)),
                                  y_split)
    # env=0 overrides an explicit split_tail=True ...
    monkeypatch.setenv("TUX_SPLIT_TAIL", "0")
    np.testing.assert_array_equal(
        run(get_model("FastTransformer", split_tail=True, **kw)), y_fold)
    # ... and env=1 overrides an explicit split_tail=False.
    monkeypatch.setenv("TUX_SPLIT_TAIL", "1")
    np.testing.assert_array_equal(
        run(get_model("FastTransformer", split_tail=False, **kw)), y_split)


def test_fast_transformer_conv1_stream_bit_exact_and_env(monkeypatch):
    """conv1_stream=True (ops/pallas/stream.conv1_dots_stream) is
    bit-identical to the XLA dots conv1 in the full serving forward AT
    THIS GEOMETRY (exact zero-padded K + same epilogue rounding; at
    other sizes XLA may tile the K=54 einsum's f32 reduction tree
    differently, giving bf16-ulp-level diffs on ~3% of pixels —
    measured at 240x320), and the TUX_CONV1_STREAM debug env var
    overrides the field both ways."""
    import jax
    import jax.numpy as jnp

    from transformerupscaler_tpu.registry import get_model

    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (1, 16, 32, 3), jnp.bfloat16)
    kw = dict(dtype=jnp.bfloat16, compose_tails=True, pallas_serve=True)
    params = get_model("FastTransformer", **kw).init(key, x,
                                                     upscale_factor=2)

    def run(model):
        return np.asarray(model.apply(params, x, upscale_factor=2),
                          np.float32)

    y_off = run(get_model("FastTransformer", conv1_stream=False, **kw))
    y_on = run(get_model("FastTransformer", conv1_stream=True, **kw))
    np.testing.assert_array_equal(y_on, y_off)

    # env=1 forces the stream on a conv1_stream=False model; make the
    # two routings distinguishable via a counter on the kernel entry.
    import transformerupscaler_tpu.ops.pallas.stream as stream_mod

    calls = []
    orig = stream_mod.conv1_dots_stream

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(stream_mod, "conv1_dots_stream", spy)
    monkeypatch.setenv("TUX_CONV1_STREAM", "1")
    run(get_model("FastTransformer", conv1_stream=False, **kw))
    assert calls, "TUX_CONV1_STREAM=1 must route to conv1_dots_stream"
    calls.clear()
    monkeypatch.setenv("TUX_CONV1_STREAM", "0")
    run(get_model("FastTransformer", conv1_stream=True, **kw))
    assert not calls, "TUX_CONV1_STREAM=0 must route to the XLA conv1"


def test_fast_transformer_config_interactions_smoke():
    """Config-field INTERACTIONS (each field is covered alone above):
    serve_quality x split_tail x conv1_stream combinations trace, run,
    and land within the headline config's error envelope vs the exact
    f32 path (interior; 2x the headline's MSE as the envelope)."""
    import jax
    import jax.numpy as jnp

    from transformerupscaler_tpu.registry import get_model

    key = jax.random.PRNGKey(11)
    x = jax.random.uniform(key, (1, 16, 32, 3), jnp.float32)
    exact = get_model("FastTransformer", dtype=jnp.float32)
    params = exact.init(key, x, upscale_factor=2)
    y_e = np.asarray(exact.apply(params, x, upscale_factor=2), np.float32)
    kw = dict(dtype=jnp.bfloat16, compose_tails=True, pallas_serve=True)
    head = get_model("FastTransformer", **kw)
    y_h = np.asarray(head.apply(params, x.astype(jnp.bfloat16),
                                upscale_factor=2), np.float32)

    def mse(a, b, c=4):
        return float(np.mean((a[:, c:-c, c:-c] - b[:, c:-c, c:-c]) ** 2))

    envelope = 2.0 * mse(y_h, y_e) + 1e-7
    combos = [
        dict(serve_quality=True, split_tail=True, hi_lo_fin="wf"),
        dict(conv1_stream=True, split_tail=True),
        dict(serve_quality=True, conv1_stream=True, fold_pre=True),
    ]
    for c in combos:
        m = get_model("FastTransformer", **kw, **c)
        xin = x if c.get("serve_quality") else x.astype(jnp.bfloat16)
        y = np.asarray(m.apply(params, xin, upscale_factor=2), np.float32)
        assert y.shape == y_e.shape, c
        assert np.isfinite(y).all(), c
        assert mse(y, y_e) <= envelope, (c, mse(y, y_e), envelope)
