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


def get_model(name: str):
    """Return an instantiated default-config model for ``name``."""
    _ensure_builtin_loaded()
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown model {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name].factory()


def list_models() -> list[str]:
    _ensure_builtin_loaded()
    return sorted(_REGISTRY)
