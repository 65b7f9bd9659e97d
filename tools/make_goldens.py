#!/usr/bin/env python
"""Generate golden parity fixtures from the reference PyTorch implementation.

Runs the reference models (imported from /root/reference, read-only) at tiny
configs on random inputs and stores (state_dict, input, output) npz fixtures
under tests/golden/. Tests then convert the stored state_dict with
``torch_convert`` and assert our forward matches the stored output — no
reference import at test time.

Usage: python tools/make_goldens.py
"""

import json
import os
import sys

import numpy as np
import torch

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

sys.path.insert(0, REFERENCE)

# torchvision isn't installed in this image; the reference only needs
# transforms.Resize (antialiased bilinear on 4-D tensors) — shim it.
import types  # noqa: E402
import torch.nn.functional as _F  # noqa: E402


class _Resize:
    def __init__(self, size):
        self.size = tuple(size) if isinstance(size, (tuple, list)) else size

    def __call__(self, t):
        return _F.interpolate(t, size=self.size, mode="bilinear",
                              align_corners=False, antialias=True)


_tv = types.ModuleType("torchvision")
_tv_tr = types.ModuleType("torchvision.transforms")
_tv_tr.Resize = _Resize
_tv.transforms = _tv_tr
sys.modules["torchvision"] = _tv
sys.modules["torchvision.transforms"] = _tv_tr

TINY = dict(base_channels=8, transformer_dim=16, num_heads=2, dropout=0.0)


def _rand_input(seed, shape):
    """Deterministic input (NCHW); tests regenerate it from (seed, shape)
    instead of storing the array."""
    return np.random.default_rng(seed).random(shape, dtype=np.float64).astype(np.float32)


def _save(name, model, x_seed, x_shape, out_nchw, config, call_kwargs):
    os.makedirs(OUT_DIR, exist_ok=True)
    arrays = {f"sd:{k}": v.detach().numpy() for k, v in model.state_dict().items()}
    arrays["y"] = out_nchw.detach().numpy()
    arrays["meta"] = np.frombuffer(
        json.dumps({"config": config, "call": call_kwargs,
                    "x_seed": x_seed, "x_shape": list(x_shape)}).encode(),
        dtype=np.uint8)
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} ({os.path.getsize(path)/1024:.0f} KiB)")


def main():
    import importlib

    fast_mod = importlib.import_module("models.FastTransformer.model")
    win_mod = importlib.import_module("models.WindowTransformer.model")
    res_mod = importlib.import_module("models.ResidualTransformer.model")

    # --- FastTransformer ---
    cfg = dict(TINY, num_window_blocks=2)
    cases = [
        ("fast_upscale3", dict(upscale_factor=3), 101, (1, 3, 100, 100)),
        ("fast_resout_squash", dict(res_out=(60, 78), require_ratio=True), 102, (1, 3, 40, 52)),
        ("fast_resout_nosquash", dict(res_out=(60, 78), require_ratio=False), 103, (1, 3, 40, 52)),
        ("fast_upscale6", dict(upscale_factor=6), 104, (1, 3, 48, 48)),
    ]
    for name, kwargs, seed, shape in cases:
        torch.manual_seed(7)
        m = fast_mod.TransformerModel(**cfg).eval()
        x = torch.from_numpy(_rand_input(seed, shape))
        with torch.no_grad():
            y = m(x, **kwargs)
        _save(name, m, seed, shape, y, cfg,
              {k: list(v) if isinstance(v, tuple) else v for k, v in kwargs.items()})

    # --- WindowTransformer ---
    cfg = dict(TINY, num_window_blocks=2)
    cases = [
        ("window_resout", dict(res_out=(96, 144)), 105, (1, 3, 64, 96)),
        ("window_odd", dict(res_out=(100, 140)), 106, (1, 3, 50, 70)),
    ]
    for name, kwargs, seed, shape in cases:
        torch.manual_seed(11)
        m = win_mod.TransformerModel(**cfg).eval()
        x = torch.from_numpy(_rand_input(seed, shape))
        with torch.no_grad():
            y = m(x, **kwargs)
        _save(name, m, seed, shape, y, cfg,
              {k: list(v) if isinstance(v, tuple) else v for k, v in kwargs.items()})

    # --- ResidualTransformer (fixed 720p input geometry, small res_out to
    # keep the fixture light) ---
    cfg = dict(base_channels=8, transformer_dim=16, num_heads=2, dropout=0.0,
               num_transformer_blocks=2)
    torch.manual_seed(13)
    m = res_mod.TransformerModel(**cfg).eval()
    seed, shape = 107, (1, 3, 720, 1280)
    x = torch.from_numpy(_rand_input(seed, shape))
    with torch.no_grad():
        y = m(x, res_out=(360, 640))
    _save("residual_default", m, seed, shape, y, cfg, {"res_out": [360, 640]})


if __name__ == "__main__":
    main()
