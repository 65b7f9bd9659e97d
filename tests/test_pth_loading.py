"""Legacy .pth checkpoint path: torch state_dict -> discovery -> conversion
-> engine forward (synthesized reference-shaped weights, no reference import)."""

import numpy as np
import torch

from transformerupscaler_tpu.infer_lib import UpscalerEngine


def _window_transformer_state_dict(rng, base=64, dim=128, blocks=8, heads=8):
    """State dict with the reference WindowTransformer's names/shapes
    (models/WindowTransformer/model.py:187-222)."""
    t = lambda *s: torch.from_numpy(rng.standard_normal(s).astype(np.float32) * 0.05)
    sd = {
        "conv1.weight": t(base, 3, 3, 3), "conv1.bias": t(base),
        "conv2.weight": t(base, base, 3, 3), "conv2.bias": t(base),
        "downsample.weight": t(base, base, 3, 3), "downsample.bias": t(base),
        "patch_embed.weight": t(dim, base, 8, 8), "patch_embed.bias": t(dim),
        "patch_unembed.weight": t(dim, base, 8, 8), "patch_unembed.bias": t(base),
        "decoder_conv1.weight": t(base, base, 3, 3), "decoder_conv1.bias": t(base),
        "decoder_conv2.weight": t(3, base, 3, 3), "decoder_conv2.bias": t(3),
    }
    for i in range(blocks):
        p = f"window_blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": t(dim), f"{p}.norm1.bias": t(dim),
            f"{p}.norm2.weight": t(dim), f"{p}.norm2.bias": t(dim),
            f"{p}.attn.qkv.weight": t(3 * dim, dim),
            f"{p}.attn.qkv.bias": t(3 * dim),
            f"{p}.attn.proj.weight": t(dim, dim),
            f"{p}.attn.proj.bias": t(dim),
            f"{p}.attn.relative_position_bias_table": t(225, heads),
            f"{p}.mlp.0.weight": t(4 * dim, dim), f"{p}.mlp.0.bias": t(4 * dim),
            f"{p}.mlp.2.weight": t(dim, 4 * dim), f"{p}.mlp.2.bias": t(dim),
        })
    return sd


def test_pth_checkpoint_end_to_end(tmp_path, rng):
    ckpt_dir = tmp_path / "checkpoints"
    ckpt_dir.mkdir()
    sd = _window_transformer_state_dict(rng)
    torch.save(sd, ckpt_dir / "model_epoch_42.pth")

    eng = UpscalerEngine("WindowTransformer", checkpoint_dir=str(ckpt_dir))
    assert eng.epoch == 42
    assert eng.checkpoint_path.endswith("model_epoch_42.pth")
    out = eng.upscale(np.zeros((32, 32, 3), np.float32), res_out=(64, 64))
    assert out.shape == (64, 64, 3)
    assert eng.param_count() == 2_763_651
