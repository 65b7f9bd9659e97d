"""Model registry replacing the reference's importlib dynamic import.

Parity: reference train.py:49-50 resolves ``--model NAME`` to
``models/{NAME}/model.py`` and expects a ``TransformerModel`` class; here the
same names resolve through an explicit registry so jit caches, shardings, and
configs stay first-class. Checkpoint directories keep the reference layout
``models/{NAME}/checkpoints/``.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass
from typing import Callable

_REGISTRY: dict[str, "ModelEntry"] = {}


@dataclass(frozen=True)
class ModelEntry:
    name: str
    factory: Callable  # () -> flax module (default config)
    description: str = ""


def register_model(name: str, description: str = ""):
    def wrap(factory):
        _REGISTRY[name] = ModelEntry(name=name, factory=factory, description=description)
        return factory
    return wrap


def _ensure_builtin_loaded():
    # Import for registration side effects.
    importlib.import_module("transformerupscaler_tpu.models")


def get_model(name: str, **overrides):
    """Return an instantiated model for ``name``. ``overrides`` are module
    fields (e.g. dtype, attn_impl); unknown fields are ignored so shared
    settings can be passed to every variant (Bicubic has no fields)."""
    _ensure_builtin_loaded()
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown model {name!r}; available: {sorted(_REGISTRY)}"
        )
    factory = _REGISTRY[name].factory
    if overrides:
        import dataclasses

        if dataclasses.is_dataclass(factory):
            fields = {f.name for f in dataclasses.fields(factory)}
            overrides = {k: v for k, v in overrides.items() if k in fields}
        return factory(**overrides)
    return factory()


def list_models() -> list[str]:
    _ensure_builtin_loaded()
    return sorted(_REGISTRY)
