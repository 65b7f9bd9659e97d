from transformerupscaler_tpu.data.datasets import (  # noqa: F401
    HighresImageDataset,
    OnlineHighresDataset,
)
from transformerupscaler_tpu.data.bucketing import bucket_batch  # noqa: F401
