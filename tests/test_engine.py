"""UpscalerEngine tests: jit caching, checkpoint loading, quantization."""

import numpy as np
import pytest

from transformerupscaler_tpu.checkpoint import save_checkpoint
from transformerupscaler_tpu.infer_lib import UpscalerEngine


def test_bicubic_engine_scale_and_resout():
    eng = UpscalerEngine("BicubicInterpolation")
    x = np.random.default_rng(0).random((24, 32, 3)).astype(np.float32)
    out = eng.upscale(x, upscale_factor=2)
    assert out.shape == (48, 64, 3)
    out = eng.upscale(x, res_out=(36, 48))
    assert out.shape == (36, 48, 3)
    # uint8 input accepted
    out = eng.upscale((x * 255).astype(np.uint8), upscale_factor=2)
    assert out.shape == (48, 64, 3)


def test_engine_jit_cache_reuse():
    eng = UpscalerEngine("BicubicInterpolation")
    x = np.zeros((16, 16, 3), np.float32)
    eng.upscale(x, upscale_factor=2)
    assert len(eng._cache) == 1
    eng.upscale(x, upscale_factor=2)
    assert len(eng._cache) == 1
    eng.upscale(x, upscale_factor=3)
    assert len(eng._cache) == 2


def test_engine_loads_latest_checkpoint(tmp_path):
    import jax
    import jax.numpy as jnp

    from transformerupscaler_tpu.registry import get_model

    model = get_model("WindowTransformer")
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, res_out=(32, 32))
    ckpt_dir = tmp_path / "models" / "WindowTransformer" / "checkpoints"
    save_checkpoint(str(ckpt_dir), 7, params["params"])

    eng = UpscalerEngine("WindowTransformer", checkpoint_dir=str(ckpt_dir))
    assert eng.epoch == 7
    assert eng.checkpoint_path.endswith("model_epoch_7")
    out = eng.upscale(np.zeros((16, 16, 3), np.float32), res_out=(32, 32))
    assert out.shape == (32, 32, 3)
    assert eng.param_count() == 2_763_651


def test_engine_batch_input():
    eng = UpscalerEngine("BicubicInterpolation")
    x = np.zeros((4, 16, 16, 3), np.float32)
    out = eng.upscale(x, res_out=(32, 32))
    assert out.shape == (4, 32, 32, 3)


def test_quantized_engine_close_to_fp(tmp_path):
    import jax
    import jax.numpy as jnp

    from transformerupscaler_tpu.registry import get_model

    model = get_model("WindowTransformer")
    x = jnp.asarray(np.random.default_rng(3).random((1, 16, 16, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x, res_out=(32, 32))
    ckpt_dir = tmp_path / "ckpt"
    save_checkpoint(str(ckpt_dir), 1, params["params"])

    eng_fp = UpscalerEngine("WindowTransformer", checkpoint_dir=str(ckpt_dir))
    eng_q = UpscalerEngine("WindowTransformer", checkpoint_dir=str(ckpt_dir),
                           quantize=True)
    xi = np.asarray(x[0])
    out_fp = eng_fp.upscale(xi, res_out=(32, 32))
    out_q = eng_q.upscale(xi, res_out=(32, 32))
    # int8 weight quantization perturbs but must stay close.
    assert np.abs(out_fp - out_q).max() < 0.05
    assert np.abs(out_fp - out_q).max() > 0.0  # it actually did something


def test_fast_flag_warns_on_unsupported_geometry():
    import warnings

    import numpy as np

    from transformerupscaler_tpu.infer_lib import UpscalerEngine

    eng = UpscalerEngine("FastTransformer", checkpoint_dir="/tmp/nonexistent",
                        packed_serve=True, compose_tails=True)
    img = np.zeros((20, 20, 3), np.float32)  # w % 16 != 0 -> gate misses
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        eng.upscale(img, upscale_factor=2)
        assert any("falling back" in str(x.message) for x in w)
    # One-time: a second call must not warn again.
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        eng.upscale(img, upscale_factor=2)
        assert not any("falling back" in str(x.message) for x in w)
