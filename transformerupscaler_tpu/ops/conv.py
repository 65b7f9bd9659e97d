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


def compose_conv3x3_kernels(k1: jnp.ndarray, b1: jnp.ndarray | None,
                            k2: jnp.ndarray, b2: jnp.ndarray | None):
    """Compose two 3x3/any-size correlation kernels into one.

    ``conv(conv(x, k1, pad) , k2, pad)`` == ``conv(x, k_comp, pad+pad)``
    everywhere EXCEPT a 1-pixel border ring (the sequential form zero-pads
    the *intermediate*, the composed form zero-pads the *input*). Used for
    the flag-gated fast inference path; the exact path keeps both convs.

    k1: (a, a, C, M); k2: (b, b, M, O) -> (a+b-1, a+b-1, C, O).
    Returns (k_comp, b_comp) with b_comp folding k2 applied to the constant
    b1 plus b2.
    """
    a = k1.shape[0]
    b = k2.shape[0]
    n = a + b - 1
    c, o = k1.shape[2], k2.shape[3]
    kc = jnp.zeros((n, n, c, o), k1.dtype)
    for p in range(a):
        for q in range(a):
            for s in range(b):
                for t in range(b):
                    kc = kc.at[p + s, q + t].add(
                        jnp.einsum("cm,mo->co", k1[p, q], k2[s, t]))
    bc = None
    if b1 is not None or b2 is not None:
        bc = jnp.zeros((o,), k1.dtype)
        if b1 is not None:
            bc = bc + jnp.einsum("stmo,m->o", k2, b1.astype(k2.dtype))
        if b2 is not None:
            bc = bc + b2.astype(k1.dtype)
    return kc, bc
