"""TransformerUpscaler-TPU: a TPU-native JAX re-implementation of the
Exidekat/TransformerUpscaler super-resolution framework.

The reference project (/root/reference, PyTorch, single-device) provides a
hybrid CNN–Transformer single-image super-resolution model family with
training, inference/eval, A/B comparison, throughput, and live-overlay entry
points. This package rebuilds every component TPU-first:

- jnp/XLA compute path with static-shape discipline (geometry-bucketed jit)
- patch embed/unembed and image resizing expressed as MXU matmuls
- fused window-attention Pallas kernel for the hot op
- jax.sharding.Mesh data/tensor parallelism for multi-chip scaling
- Orbax checkpoints with the reference's `model_epoch_{n}` discovery semantics
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("TUX_PLATFORM"):
    # Env-var device pinning (e.g. TUX_PLATFORM=cpu for tests/debug). The
    # container sitecustomize force-registers the TPU platform, so this must
    # go through jax.config, not JAX_PLATFORMS.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["TUX_PLATFORM"])

from transformerupscaler_tpu.resolutions import resolutions  # noqa: F401
from transformerupscaler_tpu.registry import get_model, list_models  # noqa: F401
