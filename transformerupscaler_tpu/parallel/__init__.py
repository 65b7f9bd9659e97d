from transformerupscaler_tpu.parallel.mesh import make_mesh  # noqa: F401
from transformerupscaler_tpu.parallel.context import (  # noqa: F401
    activation_sharding,
    maybe_shard_heads,
)
