"""Kernel-composition fast path: interior-exact vs the sequential form."""

import jax
import jax.numpy as jnp
import numpy as np

from transformerupscaler_tpu.models.fast_transformer import FastTransformer
from transformerupscaler_tpu.ops.conv import compose_conv3x3_kernels, conv2d


def test_composed_conv_interior_exact(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 20, 8)).astype(np.float32))
    k1 = jnp.asarray(rng.standard_normal((3, 3, 8, 12)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.standard_normal((12,)).astype(np.float32))
    k2 = jnp.asarray(rng.standard_normal((3, 3, 12, 4)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))

    seq = conv2d(conv2d(x, k1, b1), k2, b2)
    kc, bc = compose_conv3x3_kernels(k1, b1, k2, b2)
    comp = conv2d(x, kc, bc, padding=2)

    # Interior (1-pixel ring excluded) must match exactly.
    np.testing.assert_allclose(np.asarray(comp[:, 1:-1, 1:-1]),
                               np.asarray(seq[:, 1:-1, 1:-1]),
                               atol=2e-4, rtol=1e-4)
    # And the border deviation stays bounded.
    assert float(jnp.abs(comp - seq).max()) < 10.0


def test_fast_transformer_compose_tails_close(rng):
    cfg = dict(base_channels=8, transformer_dim=16, num_heads=2,
               num_window_blocks=1, dropout=0.0)
    exact = FastTransformer(**cfg)
    fast = FastTransformer(**cfg, compose_tails=True)
    x = jnp.asarray(rng.random((1, 40, 48, 3)).astype(np.float32))
    params = exact.init(jax.random.PRNGKey(0), x, upscale_factor=2)
    a = np.asarray(exact.apply(params, x, upscale_factor=2))
    b = np.asarray(fast.apply(params, x, upscale_factor=2))
    # Interior identical; only the upscaled border ring may deviate.
    r = 4  # 2 feature px * scale 2
    np.testing.assert_allclose(b[:, r:-r, r:-r], a[:, r:-r, r:-r],
                               atol=5e-5, rtol=1e-4)
    # Overall still close (outputs are clamped [0,1]); with random untrained
    # weights the border ring dominates the mean on a tiny image.
    assert np.abs(a - b).mean() < 0.01
