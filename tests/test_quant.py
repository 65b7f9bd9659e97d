"""Int8 quantization ops: weight round-trip scope and the int8 MXU einsum."""

import jax.numpy as jnp
import numpy as np

from transformerupscaler_tpu.ops.quant import (
    int8_dense,
    quantize_linear_params,
    quantize_weight,
)


def test_quantize_scope_matches_torch_linear_set(rng):
    params = {
        "conv1": {"kernel": rng.standard_normal((3, 3, 3, 8)).astype(np.float32)},
        "blocks_0": {
            "attn": {"qkv_kernel": rng.standard_normal((8, 24)).astype(np.float32),
                     "bias_table": rng.standard_normal((49, 2)).astype(np.float32)},
            "mlp_fc1": {"kernel": rng.standard_normal((8, 32)).astype(np.float32),
                        "bias": rng.standard_normal((32,)).astype(np.float32)},
        },
    }
    q = quantize_linear_params(params)
    # Convs (4-D) untouched — torch quantize_dynamic only hits nn.Linear.
    np.testing.assert_array_equal(q["conv1"]["kernel"], params["conv1"]["kernel"])
    # Bias table untouched (not a linear weight).
    np.testing.assert_array_equal(q["blocks_0"]["attn"]["bias_table"],
                                  params["blocks_0"]["attn"]["bias_table"])
    # Linear kernels round-tripped: changed but close.
    for path in [("attn", "qkv_kernel"), ("mlp_fc1", "kernel")]:
        a = params["blocks_0"][path[0]][path[1]]
        b = q["blocks_0"][path[0]][path[1]]
        assert not np.array_equal(a, b)
        assert np.abs(a - b).max() < np.abs(a).max() / 64


def test_int8_dense_close_to_fp(rng):
    x = jnp.asarray(rng.standard_normal((5, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    wq, scale = quantize_weight(w)
    assert wq.dtype == jnp.int8
    got = np.asarray(int8_dense(x, wq, scale, b))
    want = np.asarray(x @ w + b)
    assert np.abs(got - want).max() < 0.15 * np.abs(want).max() + 0.1


def test_quantize_zero_weight_column(rng):
    w = jnp.asarray(np.zeros((4, 4), np.float32))
    wq, scale = quantize_weight(w)
    assert np.all(np.asarray(wq) == 0)
    assert np.all(np.isfinite(np.asarray(scale)))


def test_int8_mlp_model_path(rng):
    import jax

    from transformerupscaler_tpu.models.window_transformer import WindowTransformer

    cfg = dict(base_channels=8, transformer_dim=16, num_heads=2,
               num_window_blocks=1, dropout=0.0)
    fp = WindowTransformer(**cfg)
    q8 = WindowTransformer(**cfg, int8_mlp=True)
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    params = fp.init(jax.random.PRNGKey(0), x, res_out=(64, 64))
    a = np.asarray(fp.apply(params, x, res_out=(64, 64)))
    b = np.asarray(q8.apply(params, x, res_out=(64, 64)))
    assert not np.array_equal(a, b)      # quantization engaged
    assert np.abs(a - b).max() < 0.05    # but stays close


def test_int8_serve_close_to_f32():
    """int8_serve (packed path, dynamic act quant) tracks the f32 compose
    output within quantization error."""
    import jax
    import jax.numpy as jnp
    from transformerupscaler_tpu.registry import get_model

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 48, 64, 3), jnp.float32)
    m_c = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True)
    m_q = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                    int8_serve=True)
    params = m_c.init(key, x, res_out=(72, 96))
    y_c = np.asarray(m_c.apply(params, x, res_out=(72, 96)))
    y_q = np.asarray(m_q.apply(params, x, res_out=(72, 96)))
    diff = np.abs(y_c - y_q)
    assert diff.mean() < 0.01, diff.mean()
    assert diff.max() < 0.2, diff.max()


def test_int8_serve_static_calibration(tmp_path):
    """Engine calibration bakes static scales; static output stays close to
    the dynamic-quant output on the calibration frame."""
    import jax.numpy as jnp
    from transformerupscaler_tpu.infer_lib import UpscalerEngine

    rng = np.random.default_rng(0)
    img = rng.random((48, 64, 3)).astype(np.float32)
    eng = UpscalerEngine("FastTransformer", checkpoint_dir=str(tmp_path),
                         dtype=jnp.float32, compose_tails=True,
                         int8_serve=True)
    y_dyn = eng.upscale(img, res_out=(72, 96))
    scales = eng.calibrate_int8(img, res_out=(72, 96))
    assert len(scales) == 5
    assert all(v > 0 for group in scales for v in group)
    assert eng.model.int8_scales == scales
    y_stat = eng.upscale(img, res_out=(72, 96))
    # margin=1.25 shifts quant grids; outputs agree to quant error.
    assert np.abs(y_dyn - y_stat).mean() < 0.01


def test_int8_residual_scope_much_closer_to_f32():
    """"residual" scope quantizes only the residual branch; its output must
    be much closer to f32 than the full scope."""
    import jax
    import jax.numpy as jnp
    from transformerupscaler_tpu.registry import get_model

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 48, 64, 3), jnp.float32)
    m_c = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True)
    m_r = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                    int8_serve=True, int8_scope="residual")
    m_f = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                    int8_serve=True, int8_scope="full")
    params = m_c.init(key, x, res_out=(72, 96))
    y_c = np.asarray(m_c.apply(params, x, res_out=(72, 96)))
    e_r = np.abs(np.asarray(m_r.apply(params, x, res_out=(72, 96))) - y_c)
    e_f = np.abs(np.asarray(m_f.apply(params, x, res_out=(72, 96))) - y_c)
    assert e_r.mean() < e_f.mean()
    assert e_r.mean() < 5e-3, e_r.mean()


def test_int8_packed_conv_exact_on_grid():
    """With inputs and weights already on the int8 grid, the int8 packed
    conv must reproduce the float conv exactly (the int path is then
    error-free integer arithmetic)."""
    import jax.numpy as jnp
    from transformerupscaler_tpu.ops.conv import (
        conv2d,
        conv2d_packed_int8,
        conv2d_tail_packed_int8,
    )

    rng = np.random.default_rng(3)
    xs = 1.0 / 127
    xi = rng.integers(0, 128, (1, 8, 16, 64))
    x = (xi * xs).astype(np.float32)
    kq = rng.integers(-127, 128, (3, 3, 64, 64))
    ks = 0.01
    k = (kq * ks).astype(np.float32)
    b = rng.standard_normal(64).astype(np.float32)

    ref = conv2d(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b), relu=True,
                 auto_macro=False)
    xq = jnp.asarray(xi, jnp.int8).reshape(1, 8, 8, 128)
    got = conv2d_packed_int8(xq, jnp.asarray(k), xs, jnp.asarray(b),
                             relu=True, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got).reshape(1, 8, 16, 64),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)

    kq5 = rng.integers(-127, 128, (5, 5, 64, 12))
    k5 = (kq5 * 0.003).astype(np.float32)
    b5 = rng.standard_normal(12).astype(np.float32)
    ref5 = conv2d(jnp.asarray(x), jnp.asarray(k5), jnp.asarray(b5),
                  padding=2, relu=True, auto_macro=False)
    got5 = conv2d_tail_packed_int8(xq, jnp.asarray(k5), xs, jnp.asarray(b5),
                                   relu=True, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got5).reshape(1, 8, 16, 12),
                               np.asarray(ref5), rtol=1e-5, atol=1e-5)


def test_multiframe_calibration_and_clip_check(tmp_path):
    """calibrate_int8 over several frames takes the per-channel max; a
    brighter held-out frame reports clip risk via calibration_check."""
    import jax.numpy as jnp
    from transformerupscaler_tpu.infer_lib import UpscalerEngine

    rng = np.random.default_rng(1)
    frames = [rng.random((48, 64, 3)).astype(np.float32) * 0.5
              for _ in range(3)]
    eng = UpscalerEngine("FastTransformer", checkpoint_dir=str(tmp_path),
                         dtype=jnp.float32, compose_tails=True,
                         int8_serve=True)
    eng.calibrate_int8(frames, res_out=(72, 96), margin=1.1)
    assert eng._calib_frames == 3
    # A calibration member is covered by construction (dyn <= max/1.1)...
    rep = eng.calibration_check(frames[0], res_out=(72, 96))
    assert all(v["max_ratio"] <= 1.0 for v in rep.values())
    # ...and a much brighter frame must surface a clip ratio > 1 somewhere.
    rep_hot = eng.calibration_check(
        np.ones((48, 64, 3), np.float32), res_out=(72, 96))
    assert max(v["max_ratio"] for v in rep_hot.values()) > 1.0


def test_gptq_reduces_output_error():
    """GPTQ must beat plain rounding in the ||X(W - Q*s)|| metric it
    optimizes (same scales, same int8 format)."""
    from transformerupscaler_tpu.ops.gptq import gptq_quantize

    rng = np.random.default_rng(0)
    d, co, n = 64, 16, 8000
    mix = rng.standard_normal((d, d)) * 0.3 + np.eye(d)
    x = rng.standard_normal((n, d)) @ mix
    w = rng.standard_normal((d, co)) * 0.1
    q, s = gptq_quantize(w, x.T @ x)
    sp = np.abs(w).max(axis=0) / 127.0
    qp = np.clip(np.round(w / sp), -127, 127)
    err_gptq = np.linalg.norm(x @ (w - q * s))
    err_plain = np.linalg.norm(x @ (w - qp * sp))
    assert err_gptq < err_plain * 0.95, (err_gptq, err_plain)
    assert q.dtype == np.int8 and s.shape == (co,)


def test_gptq_engine_bakes_prequantized_weights(tmp_path):
    """gptq_int8 bakes int8_weights entries; the model still runs and stays
    close to the f32 path."""
    import jax.numpy as jnp
    from transformerupscaler_tpu.infer_lib import UpscalerEngine

    rng = np.random.default_rng(0)
    frames = [rng.random((48, 64, 3)).astype(np.float32) for _ in range(2)]
    eng_f = UpscalerEngine("FastTransformer", checkpoint_dir=str(tmp_path),
                           dtype=jnp.float32, compose_tails=True,
                           packed_serve=True)
    y_ref = eng_f.upscale(frames[0], res_out=(72, 96))
    eng = UpscalerEngine("FastTransformer", checkpoint_dir=str(tmp_path),
                         dtype=jnp.float32, compose_tails=True,
                         int8_serve=True, int8_scope="full",
                         params=eng_f._params)
    eng.calibrate_int8(frames, res_out=(72, 96), margin=1.1)
    eng.gptq_int8(frames, scale=2, n_samples=4000, crop=48)
    assert eng.model.int8_weights is not None
    names = {e[0] for e in eng.model.int8_weights}
    assert names == {"conv1", "conv2", "tailA_s2"}
    y = eng.upscale(frames[0], res_out=(72, 96))
    assert np.abs(y - y_ref).mean() < 0.01


def test_int8_tails_scope_close_to_f32():
    """"tails" scope (Pallas deint pipeline, int8 Pallas tail kernels with
    dynamic scales) tracks the f32 pallas path within quantization error —
    tighter than the full scope, since it quantizes a subset of full's
    tensor set."""
    import jax
    import jax.numpy as jnp
    from transformerupscaler_tpu.registry import get_model

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 48, 64, 3), jnp.float32)
    m_c = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                    pallas_serve=True)
    m_t = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                    pallas_serve=True, int8_serve=True, int8_scope="tails")
    m_f = get_model("FastTransformer", dtype=jnp.float32, compose_tails=True,
                    int8_serve=True, int8_scope="full")
    params = m_c.init(key, x, res_out=(72, 96))
    y_c = np.asarray(m_c.apply(params, x, res_out=(72, 96)))
    e_t = np.abs(np.asarray(m_t.apply(params, x, res_out=(72, 96))) - y_c)
    e_f = np.abs(np.asarray(m_f.apply(params, x, res_out=(72, 96))) - y_c)
    assert e_t.mean() > 0            # quantization engaged
    assert e_t.mean() <= e_f.mean()
    assert e_t.mean() < 5e-3, e_t.mean()


def test_int8_tails_static_calibration(tmp_path):
    """Engine calibration on the tails scope: the dynamic pass sows
    feat/dec scales through the Pallas pipeline; the static rebuild (conv
    epilogue emits int8) matches the dynamic-quant output to quant error."""
    import jax.numpy as jnp
    from transformerupscaler_tpu.infer_lib import UpscalerEngine

    rng = np.random.default_rng(0)
    img = rng.random((48, 64, 3)).astype(np.float32)
    eng = UpscalerEngine("FastTransformer", checkpoint_dir=str(tmp_path),
                         dtype=jnp.float32, compose_tails=True,
                         pallas_serve=True, int8_serve=True,
                         int8_scope="tails")
    y_dyn = eng.upscale(img, res_out=(72, 96))
    scales = eng.calibrate_int8(img, res_out=(72, 96))
    assert len(scales) == 5
    assert len(scales[1]) == 64 and len(scales[3]) == 64  # feat, dec
    assert scales[0] == (1.0,) and scales[4] == (1.0,)    # unquantized
    y_stat = eng.upscale(img, res_out=(72, 96))
    assert np.abs(y_dyn - y_stat).mean() < 0.01


def test_int8_tails_scope_direct_tails_scale6():
    """Scale 6 routes the tails scope through XLA int8 direct convs
    (Co=108 >= 64); output stays within quantization error of the f32
    pallas path."""
    import jax
    import jax.numpy as jnp
    from transformerupscaler_tpu.registry import get_model

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 48, 64, 3), jnp.float32)
    kw = dict(dtype=jnp.float32, compose_tails=True, pallas_serve=True)
    m_c = get_model("FastTransformer", **kw)
    m_t = get_model("FastTransformer", **kw, int8_serve=True,
                    int8_scope="tails")
    params = m_c.init(key, x, upscale_factor=6)
    y_c = np.asarray(m_c.apply(params, x, upscale_factor=6,
                               require_ratio=False))
    y_t, inter = jax.jit(lambda p, v: m_t.apply(
        p, v, upscale_factor=6, require_ratio=False,
        mutable=["intermediates"]))(params, x)
    e = np.abs(np.asarray(y_t) - y_c)
    assert e.mean() > 0
    assert e.mean() < 5e-3, e.mean()
    # both tail groups sowed scales (feat + dec)
    raw = inter["intermediates"]
    assert "int8_scale_feat" in raw and "int8_scale_dec" in raw
