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
