"""Numerics for the round-2 serving-path reformulations: macro convs and the
phase-split fused resize. Both must be exact (fp-noise) rewrites of the
reference-parity ops they replace."""

import numpy as np
import pytest
import jax.numpy as jnp

from transformerupscaler_tpu.ops.conv import conv2d, conv2d_macro
from transformerupscaler_tpu.ops.pixel_shuffle import pixel_shuffle
from transformerupscaler_tpu.ops.resize import (
    resize,
    resize_shuffled,
)


@pytest.mark.parametrize("kh,kw,cin,co,pad,block", [
    (5, 5, 64, 12, 2, 8),
    (3, 3, 64, 3, 1, 16),
    (5, 5, 3, 12, 2, 4),
    (3, 3, 8, 8, 1, 8),
])
def test_conv2d_macro_matches_conv2d(rng, kh, kw, cin, co, pad, block):
    x = jnp.asarray(rng.standard_normal((2, 16, 48, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kw, cin, co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(co), jnp.float32)
    ref = conv2d(x, k, b, padding=pad, relu=True)
    got = conv2d_macro(x, k, b, padding=pad, relu=True, block=block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv2d_macro_rejects_bad_width(rng):
    x = jnp.zeros((1, 8, 30, 4), jnp.float32)
    k = jnp.zeros((3, 3, 4, 3), jnp.float32)
    with pytest.raises(ValueError):
        conv2d_macro(x, k, block=8)


@pytest.mark.parametrize("r,method,antialias", [
    (2, "bilinear", True),
    (2, "bicubic", False),
    (3, "bilinear", True),
    (4, "bilinear", True),
])
def test_resize_shuffled_matches_shuffle_then_resize(rng, r, method, antialias):
    z = jnp.asarray(rng.standard_normal((1, 12, 16, 3 * r * r)), jnp.float32)
    out_hw = (18, 24)
    ref = resize(pixel_shuffle(z, r), out_hw, method=method,
                 antialias=antialias)
    got = resize_shuffled(z, r, out_hw, method=method, antialias=antialias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_resize_shuffled_upscale_direction(rng):
    # output larger than the shuffled image (e.g. 720p x2 -> 4K squash)
    z = jnp.asarray(rng.standard_normal((1, 8, 8, 12)), jnp.float32)
    ref = resize(pixel_shuffle(z, 2), (24, 40), method="bilinear",
                 antialias=True)
    got = resize_shuffled(z, 2, (24, 40))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,r", [(3, 2), (3, 3), (5, 2), (5, 3), (3, 6), (7, 2)])
def test_commute_conv_through_shuffle_general(rng, k, r):
    """conv(shuffle_r(x), k) == shuffle_r(conv(x, commuted)) for any odd k."""
    import jax.numpy as jnp

    from transformerupscaler_tpu.ops.conv import conv2d
    from transformerupscaler_tpu.ops.pixel_shuffle import (
        commute_conv_through_shuffle,
        pixel_shuffle,
    )

    c, o = 4, 5
    x = jnp.asarray(rng.standard_normal((1, 6, 8, c * r * r)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((k, k, c, o)) * 0.2, jnp.float32)
    hi = pixel_shuffle(x, r)
    want = conv2d(hi, kern, padding=(k - 1) // 2, auto_macro=False)
    kc = commute_conv_through_shuffle(kern, r)
    got = pixel_shuffle(
        conv2d(x, kc, padding=(kc.shape[0] - 1) // 2, auto_macro=False), r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kw,co,block", [(5, 12, 8), (7, 12, 8), (5, 27, 4),
                                         (7, 27, 4), (5, 48, 2), (7, 48, 2),
                                         (5, 16, 6)])
def test_conv2d_tail_packed_blocks(rng, kw, co, block):
    """Generic macro-block packed tails must equal the plain conv."""
    import jax.numpy as jnp

    from transformerupscaler_tpu.ops.conv import conv2d, conv2d_tail_packed

    cin = 8
    h, w = 6, 24
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((kw, kw, cin, co)) * 0.2,
                       jnp.float32)
    bias = jnp.asarray(rng.standard_normal(co), jnp.float32)
    want = conv2d(x, kern, bias, padding=(kw - 1) // 2, auto_macro=False)
    xp = x.reshape(1, h, w // 2, 2 * cin)
    got = conv2d_tail_packed(xp, kern, bias, block=block)
    got = got.reshape(1, h, w, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
