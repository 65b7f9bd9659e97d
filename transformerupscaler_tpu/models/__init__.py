from transformerupscaler_tpu.models.bicubic import BicubicInterpolation  # noqa: F401

try:  # the transformer variants land incrementally
    from transformerupscaler_tpu.models.window_transformer import WindowTransformer  # noqa: F401
    from transformerupscaler_tpu.models.residual_transformer import ResidualTransformer  # noqa: F401
    from transformerupscaler_tpu.models.fast_transformer import FastTransformer  # noqa: F401
except ImportError:  # pragma: no cover
    pass
