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


def test_split_tail_kernels_interior_exact(rng):
    """split_tail_kernels (mid conv + commuted-tail finish) matches
    composed_tail_kernel on the interior at every fold-eligible scale —
    the 16-phase x4 permutation included."""
    from transformerupscaler_tpu.models.upsampler import (
        Upsampler,
        composed_tail_kernel,
        split_tail_kernels,
    )

    n = 8
    up = Upsampler(n_feats=3)
    x0 = jnp.asarray(rng.standard_normal((1, 12, 16, 3)).astype(np.float32))
    params = up.init(jax.random.PRNGKey(0), x0, 2)["params"]
    pre_k = jnp.asarray(
        rng.standard_normal((3, 3, n, 3)).astype(np.float32) * 0.2)
    pre_b = jnp.asarray(rng.standard_normal((3,)).astype(np.float32))
    tail_k = jnp.asarray(
        rng.standard_normal((3, 3, 3, 3)).astype(np.float32) * 0.2)
    tail_b = jnp.asarray(rng.standard_normal((3,)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((1, 12, 16, n)).astype(np.float32))
    for scale in (2, 3, 4):
        kc, bc = composed_tail_kernel(params, scale, tail_k, tail_b,
                                      jnp.float32, pre_kernel=pre_k,
                                      pre_bias=pre_b)
        want = np.asarray(conv2d(x, kc, bc, padding=(kc.shape[0] - 1) // 2))
        (km, bm), (kf, bf) = split_tail_kernels(params, scale, tail_k,
                                                tail_b, jnp.float32,
                                                pre_kernel=pre_k,
                                                pre_bias=pre_b)
        mid = conv2d(x, km, bm, padding=(km.shape[0] - 1) // 2)
        got = np.asarray(conv2d(mid, kf, bf, padding=(kf.shape[0] - 1) // 2))
        assert got.shape == want.shape
        c = (kc.shape[0] - 1) // 2
        np.testing.assert_allclose(got[:, c:-c, c:-c], want[:, c:-c, c:-c],
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"scale {scale}")
