"""Int8 quantization.

Parity target: the reference's post-training dynamic quantization of
``nn.Linear`` layers (inference.py:111-113, app_overlay.py:282-284). Scope is
identical — only the transformer's linear weights (qkv/proj/mlp/in/out
projections), never the convs.

Two pieces:
  - ``quantize_linear_params``: per-output-channel symmetric int8 weight
    round-trip (fake quant) over the linear kernels in a param tree —
    reproduces the accuracy effect of torch's dynamic weight quantization
    while keeping the bf16/f32 compute path.
  - ``int8_dense``: a true int8xint8->int32 MXU matmul with dynamic
    per-tensor activation quantization, for the quantized serving path.
"""

import jax.numpy as jnp
import numpy as np

# Linear kernels eligible for quantization (the torch {nn.Linear} set).
_LINEAR_KEYS = {"qkv_kernel", "proj_kernel", "in_kernel", "out_kernel", "kernel"}
_LINEAR_PARENTS = {"attn", "mlp_fc1", "mlp_fc2"}


def _fake_quant(w: np.ndarray) -> np.ndarray:
    """Symmetric per-output-channel int8 round-trip; kernel is (in, out)."""
    w = np.asarray(w)
    scale = np.max(np.abs(w), axis=0, keepdims=True) / 127.0
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(w / scale), -127, 127)
    return (q * scale).astype(w.dtype)


def quantize_linear_params(params: dict) -> dict:
    """Return a copy of the param tree with linear kernels int8-round-tripped.

    Walks the tree; a leaf is quantized when it is a 2-D kernel that belongs
    to an attention/MLP projection (matching torch's nn.Linear scope).
    """

    def walk(tree, parent=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, parent=k)
            elif (
                hasattr(v, "ndim") and v.ndim == 2
                and (k in {"qkv_kernel", "proj_kernel", "in_kernel", "out_kernel"}
                     or (k == "kernel" and parent in _LINEAR_PARENTS))
            ):
                out[k] = _fake_quant(np.asarray(v))
            else:
                out[k] = v
        return out

    return walk(dict(params))


def int8_dense(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
               bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """y = dequant(quant(x) @ w_q) + bias with int8 MXU compute.

    x: (..., in) float; w_q: (in, out) int8; w_scale: (1, out) float.
    Activations are dynamically quantized per-tensor (symmetric).
    """
    x_absmax = jnp.max(jnp.abs(x))
    x_scale = jnp.maximum(x_absmax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = jnp.einsum("...i,io->...o", x_q, w_q,
                     preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(in, out) float -> (int8 kernel, (1, out) scale)."""
    scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_conv_kernel(k: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """HWIO conv kernel -> (int8 kernel, per-output-channel (O,) scale)."""
    scale = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_act(x: jnp.ndarray,
                 scale: jnp.ndarray | float | None = None
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-tensor int8 activation quant.

    scale=None -> dynamic (abs-max reduce over x: one extra device pass);
    otherwise the given static scale (free: the round/clip fuses into the
    producer's epilogue).
    """
    if scale is None:
        scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))),
                            1e-8) / 127.0
    scale = jnp.asarray(scale, jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def quantize_act_ch(x: jnp.ndarray,
                    scale=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric PER-CHANNEL (last axis) int8 activation quant.

    Per-channel input scales fold exactly into the consumer's weight kernel
    (y = sum_c w[c] x[c] = sum_c (w[c] s_c)(x[c] / s_c)), so the finer
    quantization costs nothing at run time — the int8 conv/GEMM helpers take
    the scale vector and fold it before quantizing their weights. Channel
    dynamic ranges of relu'd conv features differ by orders of magnitude,
    so this recovers most of the per-tensor quantization loss (measured in
    tools/int8_quality.py).
    """
    if scale is None:
        ax = tuple(range(x.ndim - 1))
        scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=ax),
                            1e-8) / 127.0
    scale = jnp.asarray(scale, jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale
