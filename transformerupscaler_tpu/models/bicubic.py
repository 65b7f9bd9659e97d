"""BicubicInterpolation: parameterless control-arm model.

Parity: reference models/BicubicInterpolation/model.py ("Fake model for
testing purposes", :9-13) — pure bicubic interpolation to ``res_out`` via
``F.interpolate(mode='bicubic', align_corners=False)`` (:29). Like the
reference, it takes only (x, res_out); unlike the reference (which TypeErrors
under inference.py's ``upscale_factor=`` call), the CLIs here resolve
``upscale_factor`` to a ``res_out`` before calling it.

Images are NHWC float in [0, 1] (TPU-native layout; the reference is NCHW).
"""

import flax.linen as nn
import jax.numpy as jnp

from transformerupscaler_tpu.ops import interpolate_bicubic
from transformerupscaler_tpu.registry import register_model


@register_model("BicubicInterpolation", "parameterless bicubic baseline")
class BicubicInterpolation(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray, res_out: tuple[int, int] = (1080, 1920)) -> jnp.ndarray:
        return interpolate_bicubic(x, res_out)
