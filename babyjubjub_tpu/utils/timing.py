"""Honest device timing through high-latency dispatch paths.

The axon TPU relay adds ~30-40 ms of constant round-trip per host sync,
and dispatch is asynchronous, so naive block_until_ready timing is
meaningless at these scales. Methodology: run K data-dependent iterations
of the op inside ONE jitted fori_loop, difference two K values, divide.

The chain length K is a TRACED argument (the fori_loop lowers to a while
with a dynamic trip count), so every K reuses one compiled executable —
on a cold compilation cache this cuts the per-metric compile count from
one-per-K (up to 4) to exactly 1, which is what lets the full bench suite
fit a cold driver window (VERDICT r3 weak #1).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def chain_timer(step_fn, state0, k_lo: int = 1, k_hi: int | None = None,
                repeats: int = 3, min_delta: float = 0.15,
                budget_s: float | None = None,
                chained=None) -> float:
    """Seconds per step_fn application.

    step_fn: state -> state (data-dependent so iterations can't collapse);
    state0: initial pytree of device arrays.

    With k_hi=None, the chain length auto-scales (64, 4096, 131072)
    until the K-difference exceeds `min_delta` seconds — below that the
    ~40 ms relay sync noise swamps the signal and the quotient is
    garbage. An explicit k_hi keeps the legacy fixed-K behavior.

    budget_s: soft wall-clock budget for THIS measurement; the auto-scale
    stops escalating K when the projected next run would overshoot it
    (the estimate already in hand is returned instead of being refined).

    chained: optional prebuilt `(state, k:int32) -> state` callable (an
    AOT-cached executable from utils/aot.py); when given, step_fn is
    only documentation and no tracing happens here — the bench uses this
    to skip the multi-minute per-process Pallas trace/lowering cost.
    """
    if chained is None:
        @jax.jit
        def chained(s, k):
            return jax.lax.fori_loop(0, k, lambda i, x: step_fn(x), s)

    t_begin = time.perf_counter()

    def left() -> float:
        if budget_s is None:
            return float("inf")
        return budget_s - (time.perf_counter() - t_begin)

    def t_of(k, reps=repeats):
        best = None
        for _ in range(reps):
            out = chained(state0, jnp.int32(k))
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    # one compile (+ one throwaway run) serves every K below
    np.asarray(jax.tree_util.tree_leaves(chained(state0, jnp.int32(k_lo)))[0])

    t_lo = t_of(k_lo)
    if k_hi is not None:
        t_hi = t_of(k_hi)
        return max((t_hi - t_lo) / (k_hi - k_lo), 1e-12)

    t_hi, k_used = None, None
    prev_t, prev_k = t_lo, k_lo
    for k in (64, 4096, 131072):
        if k_used is not None:
            # projected run time scales ~ K; stop refining on overshoot
            reps_next = 1 if k >= 4096 else repeats
            if prev_t * (k / prev_k) * reps_next > left():
                break
        t_hi = t_of(k, reps=1 if k >= 4096 else repeats)
        k_used = k
        prev_t, prev_k = t_hi, k
        if t_hi - t_lo >= min_delta or t_hi > 2.0:
            break
    return max((t_hi - t_lo) / (k_used - k_lo), 1e-12)


def roundtrip_seconds(repeats: int = 5) -> float:
    """Host<->device sync round-trip latency (the relay tax every public
    sync API call pays once per batch; reported so e2e rates are
    interpretable next to chained device-core rates)."""
    x = jax.device_put(np.zeros(8, dtype=np.uint32))
    np.asarray(x + 1)  # warm the trivial graph
    best = None
    for _ in range(repeats):
        y = x + 1
        t0 = time.perf_counter()
        np.asarray(y)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best
