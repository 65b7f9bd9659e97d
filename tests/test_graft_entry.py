"""The driver-facing entry points (__graft_entry__.py) stay wired.

The driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(N)`` on a virtual N-device CPU mesh; these tests keep
both contracts covered in-suite so a refactor of registry/train_lib
signatures cannot silently break the round's official validation hooks.
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_traces_to_headline_geometry():
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 1080, 1920, 3)
    assert out.dtype == jnp.bfloat16


def test_dryrun_multichip_executes_on_virtual_mesh():
    # conftest pins the 8-device CPU platform; the dryrun builds a DP x TP
    # mesh, jits the full train step over it, and asserts a finite loss.
    graft.dryrun_multichip(8)
