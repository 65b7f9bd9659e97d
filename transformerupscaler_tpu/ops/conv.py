"""Thin NHWC conv wrapper over lax.conv_general_dilated.

XLA lowers these 3x3 convs straight onto the MXU; explicit padding keeps
output-size semantics identical to PyTorch's ``padding=1`` (flax SAME padding
differs for stride 2).
"""

import jax
import jax.numpy as jnp
from jax import lax


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
           stride: int = 1, padding: int = 1, relu: bool = False) -> jnp.ndarray:
    """x: NHWC; kernel: HWIO.

    No ``preferred_element_type``: the MXU accumulates in f32 internally
    either way, and requesting an f32 output measured ~3x slower on v5e than
    letting the conv emit the input dtype directly (see tools/op_bench2.py).
    """
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=dn,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    if relu:
        out = jax.nn.relu(out)
    return out
