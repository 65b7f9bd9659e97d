"""Checkpointing with the reference's ``model_epoch_{n}`` discovery semantics,
Orbax underneath.

Parity: reference tools/utils.py:4-22 (latest = max epoch parsed from the
filename) and train.py:152-156 (save every ``checkpoint_interval`` epochs into
``models/{model}/checkpoints/``). Improvements over the reference: optimizer
state is saved alongside params (the reference silently reset Adam moments on
resume), and legacy ``.pth`` torch checkpoints load transparently through the
converter.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

_EPOCH_RE = re.compile(r"model_epoch_(\d+)(?:\.pth)?$")


def default_checkpoint_dir(model_name: str, root: str = ".") -> str:
    return os.path.join(root, "models", model_name, "checkpoints")


def get_latest_checkpoint(checkpoint_dir: str) -> tuple[str, int]:
    """Return (path, epoch) of the highest-epoch checkpoint: either an Orbax
    directory ``model_epoch_{n}`` or a legacy torch file ``model_epoch_{n}.pth``."""
    entries = []
    for f in os.listdir(checkpoint_dir):
        m = _EPOCH_RE.match(f)
        if m:
            entries.append((int(m.group(1)), f))
    if not entries:
        raise FileNotFoundError(
            f"No checkpoint files found in directory: {checkpoint_dir}")
    epoch, name = max(entries)
    return os.path.join(checkpoint_dir, name), epoch


def save_checkpoint(checkpoint_dir: str, epoch: int, params, opt_state=None) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(checkpoint_dir, f"model_epoch_{epoch}"))
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def load_checkpoint(path: str, model_name: str | None = None, template=None):
    """Load a checkpoint -> dict with at least {'params': ...}.

    ``.pth`` files route through the torch converter (``model_name`` required).
    ``template`` (optional pytree of the same structure) restores custom node
    types — e.g. optax NamedTuple states — instead of raw dicts.
    """
    if path.endswith(".pth"):
        if model_name is None:
            raise ValueError("model_name is required to convert a .pth checkpoint")
        from transformerupscaler_tpu.tools.torch_convert import load_pth

        return load_pth(path, model_name)
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    if template is not None:
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template)
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(item=template,
                                              restore_args=restore_args))
    # Restore as host numpy: checkpoints written from a TPU process carry
    # device-sharding metadata that does not resolve on other topologies.
    meta = ckptr.metadata(path).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    return ckptr.restore(path, args=ocp.args.PyTreeRestore(restore_args=restore_args))


def load_latest_params(model_name: str, checkpoint_dir: str | None = None,
                       root: str = ".") -> dict | None:
    """Variables dict ``{"params": ...}`` from the latest checkpoint of
    ``model_name``, or None when no checkpoint exists.

    The one-stop loader for serving frontends (stream.py, overlay.py,
    app_overlay.py) — the reference loads the latest checkpoint in every
    entry point (app_overlay.py:261-271, overlay.py's load path); a frontend
    that skips this silently serves random weights.
    """
    ckpt_dir = checkpoint_dir or default_checkpoint_dir(model_name, root)
    try:
        path, _ = get_latest_checkpoint(ckpt_dir)
    except (FileNotFoundError, NotADirectoryError):
        return None
    return {"params": load_checkpoint(path, model_name)["params"]}


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
