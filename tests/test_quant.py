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
