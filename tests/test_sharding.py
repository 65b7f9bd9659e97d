"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformerupscaler_tpu.parallel import activation_sharding, make_mesh


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(8, tp=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(8, tp=3)
    with pytest.raises(ValueError):
        make_mesh(100)


def test_dp_train_step_on_mesh():
    from transformerupscaler_tpu.train_lib import Trainer

    mesh = make_mesh(8)
    trainer = Trainer("WindowTransformer", checkpoint_dir="/tmp/nonexistent",
                      dtype=jnp.float32, mesh=mesh)
    rng = np.random.default_rng(0)
    samples = [(rng.random((32, 32, 3)).astype(np.float32),
                rng.random((64, 64, 3)).astype(np.float32)) for _ in range(8)]
    loss1 = trainer.train_step(samples, jax.random.PRNGKey(0))
    loss2 = trainer.train_step(samples, jax.random.PRNGKey(1))
    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert loss2 < loss1 * 1.5  # sane progression, not divergence


def test_dp_matches_single_device_loss():
    """The sharded step must compute the same loss as the unsharded one."""
    from transformerupscaler_tpu.train_lib import Trainer

    rng = np.random.default_rng(1)
    samples = [(rng.random((32, 32, 3)).astype(np.float32),
                rng.random((64, 64, 3)).astype(np.float32)) for _ in range(8)]

    t_single = Trainer("WindowTransformer", checkpoint_dir="/tmp/x",
                       dtype=jnp.float32)
    t_mesh = Trainer("WindowTransformer", checkpoint_dir="/tmp/x",
                     dtype=jnp.float32, mesh=make_mesh(8))
    t_single.init_params((32, 32), (64, 64))
    t_mesh.init_params((32, 32), (64, 64))
    # Same init seed -> identical params.
    loss_a = t_single.train_step(samples, jax.random.PRNGKey(5))
    loss_b = t_mesh.train_step(samples, jax.random.PRNGKey(5))
    assert abs(loss_a - loss_b) < 5e-4


def test_tp_head_sharding_executes():
    """DP x TP mesh: batch on 'data', attention heads on 'model'."""
    from transformerupscaler_tpu.train_lib import Trainer

    mesh = make_mesh(8, tp=2)
    trainer = Trainer("WindowTransformer", checkpoint_dir="/tmp/x",
                      dtype=jnp.float32, mesh=mesh)
    rng = np.random.default_rng(2)
    samples = [(rng.random((32, 32, 3)).astype(np.float32),
                rng.random((64, 64, 3)).astype(np.float32)) for _ in range(4)]
    loss = trainer.train_step(samples, jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_batch_sharded_inference():
    """speed_test workload scaling: shard an image batch over all chips."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from transformerupscaler_tpu.registry import get_model

    mesh = make_mesh(8)
    model = get_model("BicubicInterpolation")
    x = jnp.asarray(np.random.default_rng(0).random((8, 24, 32, 3)),
                    jnp.float32)
    x = jax.device_put(x, NamedSharding(mesh, P("data")))
    fn = jax.jit(lambda v: model.apply({}, v, res_out=(48, 64)))
    out = fn(x)
    assert out.shape == (8, 48, 64, 3)
    # Output stays batch-sharded — no gather was forced.
    assert out.sharding.spec == P("data",)


def test_sharded_upscaler_batch():
    from transformerupscaler_tpu.parallel.batch_infer import ShardedUpscaler

    mesh = make_mesh(8)
    up = ShardedUpscaler("WindowTransformer", mesh, dtype=jnp.float32)
    batch = np.random.default_rng(0).random((8, 32, 32, 3)).astype(np.float32)
    out = up.upscale_batch(batch, res_out=(64, 64))
    assert out.shape == (8, 64, 64, 3)
    from jax.sharding import PartitionSpec as P

    assert out.sharding.spec == P("data",)
    # Non-divisible batch pads then crops.
    out = up.upscale_batch(batch[:5], res_out=(64, 64))
    assert out.shape == (5, 64, 64, 3)


def test_tp_matches_single_device_loss_and_step():
    """DP x TP must be numerically equivalent to single-device training:
    same loss AND the same params after one optimizer step (a silently wrong
    sharding constraint would pass a finite-loss check)."""
    from transformerupscaler_tpu.train_lib import Trainer

    rng = np.random.default_rng(3)
    samples = [(rng.random((32, 32, 3)).astype(np.float32),
                rng.random((64, 64, 3)).astype(np.float32)) for _ in range(8)]

    t_single = Trainer("WindowTransformer", checkpoint_dir="/tmp/x",
                       dtype=jnp.float32)
    t_tp = Trainer("WindowTransformer", checkpoint_dir="/tmp/x",
                   dtype=jnp.float32, mesh=make_mesh(8, tp=2))
    t_single.init_params((32, 32), (64, 64))
    t_tp.init_params((32, 32), (64, 64))
    loss_a = t_single.train_step(samples, jax.random.PRNGKey(5))
    loss_b = t_tp.train_step(samples, jax.random.PRNGKey(5))
    assert abs(loss_a - loss_b) < 5e-4

    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        t_single.params, jax.device_get(t_tp.params))
    max_diff = max(jax.tree.leaves(diffs))
    # One Adam step moves params by ~lr=1e-4; sharded-reduction float noise
    # must stay far below that scale.
    assert max_diff < 2e-5, f"params diverged after one step: {max_diff}"
