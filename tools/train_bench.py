#!/usr/bin/env python
"""Training-step throughput on the real TPU (steps/s, samples/s).

Measures the full optimizer step — value_and_grad of the exact
train_lib.bucket_loss_sum semantics (per-sample L1 mean, require_ratio
squash, dropout) + Adam update — as a CHAINED device loop: the
(params, opt_state) carry threads m steps inside one jit (m traced, so
one compile serves both M=1 and M=K), with the RNG folded per step and a
scalar fetched at the end. Differencing M=1 vs M=K cancels the tunnel's
RPC round trip exactly like tools/probe_lib.py does for inference.

Buckets (the reference's training pairs, data_class.py:34-45): the 720p
-> 1080p streaming pair at batch 6 (padded to the trainer's rows=8) and
the 96 -> 192 crop pair. Reference loop equivalent: train.py:110-156 runs
the same samples ONE AT A TIME in eager torch.

Usage: python tools/train_bench.py [K] [bucket names...]
Buckets: 720p (6x 720p->1080p), crop (6x 96->192), both by default.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import lax

BUCKETS = {
    "720p": ((720, 1280), (1080, 1920), 6),
    "crop": ((96, 96), (192, 192), 6),
}


def bench_bucket(name, lr_hw, hr_hw, batch, K, dtype=jnp.bfloat16):
    from transformerupscaler_tpu.registry import get_model
    from transformerupscaler_tpu.ops.resize import resize_antialias_bilinear

    rows = 8 if batch == 6 else batch  # trainer pads to the next pow2
    model = get_model("FastTransformer", dtype=dtype)
    optimizer = optax.adam(1e-4)

    key = jax.random.PRNGKey(0)
    lrs = jax.random.uniform(key, (rows, *lr_hw, 3), jnp.float32)
    hrs = jax.random.uniform(key, (rows, *hr_hw, 3), jnp.float32)
    weights = jnp.asarray(
        np.concatenate([np.ones(batch), np.zeros(rows - batch)])
        .astype(np.float32))

    params = model.init(jax.random.PRNGKey(1), lrs[:1], res_out=hr_hw,
                        require_ratio=False)["params"]
    opt_state = optimizer.init(params)

    def bucket_loss_sum(p, rng):
        out = model.apply({"params": p}, lrs, res_out=hr_hw,
                          require_ratio=False, deterministic=False,
                          rngs={"dropout": rng})
        if out.shape[1:3] != hrs.shape[1:3]:
            out = resize_antialias_bilinear(out, hrs.shape[1:3])
        per_sample = jnp.mean(
            jnp.abs(out.astype(jnp.float32) - hrs.astype(jnp.float32)),
            axis=(1, 2, 3))
        return jnp.sum(per_sample * weights)

    grad_fn = jax.value_and_grad(bucket_loss_sum)

    @partial(jax.jit, donate_argnums=(0, 1))
    def chain(p, o, m):
        def body(i, carry):
            p, o = carry
            _, grads = grad_fn(p, jax.random.fold_in(jax.random.PRNGKey(2), i))
            grads = jax.tree.map(lambda g: g / batch, grads)
            updates, o = optimizer.update(grads, o, p)
            return optax.apply_updates(p, updates), o

        p, o = lax.fori_loop(0, m, body, (p, o))
        leaf = jax.tree.leaves(p)[0]
        return (p, o, jnp.sum(jnp.abs(leaf.astype(jnp.float32))))

    t0 = time.perf_counter()
    params, opt_state, _ = chain(params, opt_state, 1)
    _ = np.asarray(_)
    compile_s = time.perf_counter() - t0

    def best(m, n=4):
        nonlocal params, opt_state
        ts = []
        for _ in range(n):
            t1 = time.perf_counter()
            params, opt_state, s = chain(params, opt_state, m)
            _ = np.asarray(s)
            ts.append(time.perf_counter() - t1)
        return min(ts)

    t1, tK = best(1), best(K)
    per = (tK - t1) / (K - 1)
    print(f"{name:10s} batch {batch} ({lr_hw}->{hr_hw}): "
          f"{per * 1e3:8.1f} ms/step  {batch / per:7.2f} samples/s  "
          f"(compile {compile_s:.0f}s)", flush=True)
    return per


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    which = sys.argv[2:] or list(BUCKETS)
    print(f"device: {jax.devices()[0]}", flush=True)
    for name in which:
        lr_hw, hr_hw, batch = BUCKETS[name]
        bench_bucket(name, lr_hw, hr_hw, batch, K)


if __name__ == "__main__":
    main()
