"""Shared chained-probe timing for the tunneled TPU backend.

The only honest timing here is a host fetch behind a data dependency
(block_until_ready resolves optimistically; RPC round trip ~25 ms). Each
probe runs M applications of the op chained through a FULL-sum feedback
inside one jit and differences M=1 vs M=K to cancel the round trip.

Round-2 refinement: M is a *traced* argument (lax.fori_loop with a dynamic
bound lowers to while_loop), so each config compiles ONCE for both the M=1
and M=K measurements — remote compiles are 2-10 min each, so this halves
probe latency.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def chained_dyn(apply_fn):
    """apply_fn: (params, x) -> y. Returns jit fn(params, x, m) running the
    chain m times (m traced: one compile serves every m)."""

    def fn(p, x, m):
        def body(i, carry):
            y = apply_fn(p, carry)
            # abs before the sum: a plain full sum gets algebraically pushed
            # THROUGH purely-linear ops (sum(P @ W) == sum_cols(P) @ W),
            # shrinking e.g. a patch-embed GEMM to a vector product and
            # fabricating 50x-too-fast numbers (measured). abs is nonlinear,
            # so the whole op must execute.
            s = jnp.sum(jnp.abs(y.astype(jnp.float32)))
            # (s != s) is always 0 (False) but NOT foldable — it is an isnan
            # check, so the simplifier must keep the computation of s. This
            # form also keeps integer carries integer (so ops whose output
            # dtype differs from their input, e.g. int8-chain convs, probe
            # with a requant wrapper instead of breaking the carry type).
            return carry + (s != s).astype(carry.dtype)
        return jnp.ravel(lax.fori_loop(0, m, body, x))[0]

    return jax.jit(fn)


def probe(name, apply_fn, params, x, K=8, n=4, log=print):
    """Measure per-application seconds of apply_fn via the chained probe."""
    f = chained_dyn(apply_fn)
    t0 = time.perf_counter()
    _ = np.asarray(f(params, x, 1))
    compile_s = time.perf_counter() - t0

    def best(m):
        ts = []
        for _ in range(n):
            t1 = time.perf_counter()
            _ = np.asarray(f(params, x, m))
            ts.append(time.perf_counter() - t1)
        return min(ts)

    t1, tK = best(1), best(K)
    per = (tK - t1) / (K - 1)
    if log:
        log(f"{name:52s} {per * 1e3:8.3f} ms   (compile {compile_s:.0f}s)")
    return per
