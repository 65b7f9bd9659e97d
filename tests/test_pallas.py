"""Fused Pallas window-attention kernel: correctness vs the XLA path
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from transformerupscaler_tpu.ops.attention import window_attention
from transformerupscaler_tpu.ops.pallas.window_attn import fused_window_attention


def _params(rng, c, heads, ws):
    return dict(
        qkv_w=jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.1),
        qkv_b=jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32) * 0.1),
        proj_w=jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.1),
        proj_b=jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1),
        bias_table=jnp.asarray(
            rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(np.float32) * 0.5),
    )


@pytest.mark.parametrize("n_windows", [8, 16, 5])  # 5 exercises chunk padding
def test_fused_matches_xla(rng, n_windows):
    heads, ws, c = 12, 8, 192
    n = ws * ws
    x = jnp.asarray(rng.standard_normal((n_windows, n, c)).astype(np.float32))
    p = _params(rng, c, heads, ws)

    want = window_attention(x, p["qkv_w"], p["qkv_b"], p["proj_w"], p["proj_b"],
                            p["bias_table"], num_heads=heads, window_size=ws,
                            impl="xla")
    got = fused_window_attention(x, p["qkv_w"], p["qkv_b"], p["proj_w"],
                                 p["proj_b"], p["bias_table"], num_heads=heads,
                                 window_size=ws, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_fused_small_head_count(rng):
    heads, ws, c = 4, 4, 32
    n = ws * ws
    x = jnp.asarray(rng.standard_normal((40, n, c)).astype(np.float32))
    p = _params(rng, c, heads, ws)
    want = window_attention(x, p["qkv_w"], p["qkv_b"], p["proj_w"], p["proj_b"],
                            p["bias_table"], num_heads=heads, window_size=ws)
    got = fused_window_attention(x, p["qkv_w"], p["qkv_b"], p["proj_w"],
                                 p["proj_b"], p["bias_table"], num_heads=heads,
                                 window_size=ws, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)
