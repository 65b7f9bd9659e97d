"""Pallas conv3x3 kernel correctness (interpret mode) vs lax conv."""

import jax.numpy as jnp
import numpy as np
import pytest

from transformerupscaler_tpu.ops.conv import conv2d
from transformerupscaler_tpu.ops.pallas.conv3x3 import conv3x3_pallas


@pytest.mark.parametrize("c,o,relu,bias", [
    (64, 64, True, True),
    (64, 256, False, True),
    (256, 16, False, False),
    (8, 8, True, False),
])
def test_conv3x3_matches_lax(rng, c, o, relu, bias):
    x = jnp.asarray(rng.standard_normal((1, 16, 32, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, c, o)).astype(np.float32) * 0.1)
    b = (jnp.asarray(rng.standard_normal((o,)).astype(np.float32))
         if bias else None)
    want = conv2d(x, k, b, relu=relu)
    got = conv3x3_pallas(x, k, b, relu=relu, th=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_conv3x3_batch(rng):
    x = jnp.asarray(rng.standard_normal((3, 8, 16, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)).astype(np.float32) * 0.1)
    want = conv2d(x, k)
    got = conv3x3_pallas(x, k, th=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_conv3x3_odd_height(rng):
    # th halves down to divide H
    x = jnp.asarray(rng.standard_normal((1, 6, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.1)
    want = conv2d(x, k)
    got = conv3x3_pallas(x, k, th=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)
