"""Batch-sharded inference: the speed_test workload spread across chips.

SURVEY §2.9 / §5: the TPU-native scaling path for the throughput harness is
data sharding of the image stream over the mesh's ``data`` axis — each chip
upscales its slice of the batch, no collectives on the forward path (outputs
stay batch-sharded until fetched).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from transformerupscaler_tpu.registry import get_model


class ShardedUpscaler:
    """Jit cache of batch-sharded upscale calls over a mesh."""

    def __init__(self, model_name: str, mesh, params=None,
                 dtype=jnp.bfloat16, **model_kw):
        self.model = get_model(model_name, dtype=dtype, **model_kw)
        self.model_name = model_name
        self.mesh = mesh
        self.n_data = int(np.prod([mesh.shape[a] for a in ("data",)]))
        self.params = params
        self.dtype = dtype
        self._cache: dict = {}

    def _fn(self, res_out):
        if res_out not in self._cache:
            batch_sh = NamedSharding(self.mesh, P("data"))
            repl = NamedSharding(self.mesh, P())

            def apply(params, x):
                return self.model.apply(params, x, res_out=res_out)

            self._cache[res_out] = jax.jit(
                apply, in_shardings=(repl, batch_sh), out_shardings=batch_sh)
        return self._cache[res_out]

    def upscale_batch(self, batch_nhwc: np.ndarray, res_out: tuple[int, int]):
        """batch size must be a multiple of the data-axis size; returns a
        batch-sharded device array (fetch with np.asarray when needed)."""
        b = batch_nhwc.shape[0]
        if b % self.n_data:
            pad = self.n_data - b % self.n_data
            batch_nhwc = np.concatenate(
                [batch_nhwc, np.zeros((pad, *batch_nhwc.shape[1:]),
                                      batch_nhwc.dtype)], axis=0)
        x = jax.device_put(jnp.asarray(batch_nhwc, self.dtype),
                           NamedSharding(self.mesh, P("data")))
        if self.params is None:
            self.params = self.model.init(
                jax.random.PRNGKey(0), x[:1], res_out=tuple(res_out))
            self.params = jax.device_put(
                self.params, NamedSharding(self.mesh, P()))
        out = self._fn(tuple(res_out))(self.params, x)
        return out[:b]
