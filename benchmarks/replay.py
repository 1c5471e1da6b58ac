"""Amortized replay timing for the benchmark suite.

Tunneled TPU runtimes pay a ~20-30 ms RPC round trip per dispatch+fetch; a
single algorithm run on a small graph is mostly that floor
(VERDICT r2 weak #4). This module ports bench.py's protocol to arbitrary
algorithm bodies: replay the WHOLE run (init-or-guard + while_loop to
convergence) R times inside ONE jitted fori_loop, fetch a scalar checksum
once, and report (t_R - t_1) / (R - 1) — pure on-device per-run time.

Loop-invariant hoisting guard: seedless algorithms (pr, kcore, hits, mst,
geo, spmv, color-with-fixed-priorities) would let XLA hoist the entire
body out of the fori_loop (the computation is identical per iteration).
`guard(state, s)` threads the runtime seed scalar through a
`lax.optimization_barrier` alongside every leaf of the init state: the
barrier's operands depend on the loop index, so the barrier — and
everything downstream — must stay inside the loop. Source-seeded
algorithms (bfs, sssp, ppr, bc) vary the source instead, which also
matches how users amortize real workloads (reference batch operator,
batch/batch.hxx:61-81).

Reference parity: enact-loop-only timing (framework/enactor.hxx:243-254),
amortized like NVBench's multi-run protocol.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def tree_checksum(state) -> jax.Array:
    """Cheap order-stable scalar over a state pytree (forces execution of
    every leaf; reads only a 128-element prefix of each)."""
    acc = jnp.float32(0)
    for leaf in jax.tree.leaves(state):
        x = jnp.ravel(leaf)[:128]
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = jnp.nan_to_num(x, posinf=1.0, neginf=-1.0)
            acc = acc + jnp.sum(x) % 97.0
        else:
            acc = acc + jnp.sum(x.astype(jnp.int32) % 97).astype(jnp.float32)
    return acc


def guard(state, s):
    """Perturb every leaf of ``state`` by an arithmetic zero derived from
    the runtime seed scalar ``s`` (which must be >= 0): ``s >> 31`` is 0
    at runtime but XLA cannot fold it (no value-range analysis on runtime
    arguments), so the whole downstream computation becomes loop-variant
    and cannot be hoisted out of the replay fori_loop. (A plain
    `optimization_barrier` does NOT work here: it is elementwise over its
    operand tuple, so it never ties the seed to the state leaves.)"""
    z = jax.lax.shift_right_arithmetic(jnp.asarray(s, jnp.int32), 31)

    def g(x):
        if x.dtype == jnp.bool_:
            return x ^ (z != 0)
        return x + z.astype(x.dtype)

    return jax.tree.map(g, state)


def enact_body(step_fn, converged_fn, max_iterations):
    """body(g, state0, s) -> (state, iterations): the enactor while_loop
    from a guarded init state (for init-outside, seedless algorithms)."""
    def body(g, state0, s):
        st0 = guard(state0, s)

        def cond(carry):
            state, it = carry
            done = jnp.logical_and(it > 0, converged_fn(g, state, it))
            return jnp.logical_and(it < max_iterations,
                                   jnp.logical_not(done))

        def bod(carry):
            state, it = carry
            return step_fn(g, state, it), it + 1

        return jax.lax.while_loop(cond, bod,
                                  (st0, jnp.asarray(0, jnp.int32)))
    return body


def replay_ms(body, g, state0, seeds, *, R: int = 8, cycles: int = 3):
    """Median amortized per-run ms of ``body(g, state0, seeds[i % K])``.

    ``body`` returns (state_pytree, iterations). ``state0`` may be None
    for source-seeded bodies that init from the seed. Returns
    (ms_per_run, iterations, cycles_ms)."""
    seeds = jnp.asarray(seeds)
    K = seeds.shape[0]

    @partial(jax.jit, static_argnums=(3,))
    def rep(g, state0, seeds, R):
        def one(i, carry):
            acc, _ = carry
            st, it = body(g, state0, seeds[i % K])
            return acc + tree_checksum(st), jnp.asarray(it, jnp.int32)
        return jax.lax.fori_loop(
            0, R, one, (jnp.float32(0), jnp.int32(0)))

    def timed(n):
        t0 = time.perf_counter()
        acc, it = rep(g, state0, seeds, n)
        _ = float(acc)     # value fetch — the only reliable tunnel fence
        return (time.perf_counter() - t0) * 1e3, int(it)

    timed(1)
    timed(R)
    t1p, _ = timed(1)
    tRp, _ = timed(R)
    # adaptive replay count: (t_R - t_1) must dominate the tunnel's RTT
    # jitter (~1-3 ms) or the subtraction is noise — scale R until the
    # amortized signal is >= ~30 ms (fast bodies at small graphs would
    # otherwise report garbage like [1.87, 0.0, 0.11] ms cycles)
    signal = max(tRp - t1p, 1e-3)
    if signal < 30.0 and R < 128:
        R = min(128, max(R, int((R - 1) * 30.0 / signal) + 1))
        timed(R)
    cyc = []
    iters = 0
    for _ in range(cycles):
        t1, _ = timed(1)
        tR, iters = timed(R)
        cyc.append(max((tR - t1) / (R - 1), 1e-6))
    return float(np.median(cyc)), iters, [round(c, 3) for c in cyc]
