"""Honest device timing through high-latency dispatch paths.

The axon TPU relay adds ~30-40 ms of constant round-trip per host sync,
and dispatch is asynchronous, so naive block_until_ready timing is
meaningless at these scales. Methodology: run K data-dependent iterations
of the op inside ONE jitted fori_loop, difference two K values, divide.
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax


def chain_timer(step_fn, state0, k_lo: int = 1, k_hi: int | None = None,
                repeats: int = 3, min_delta: float = 0.15) -> float:
    """Seconds per step_fn application.

    step_fn: state -> state (data-dependent so iterations can't collapse);
    state0: initial pytree of device arrays.

    With k_hi=None, the chain length auto-scales (64, 4096, 131072)
    until the K-difference exceeds `min_delta` seconds — below that the
    ~40 ms relay sync noise swamps the signal and the quotient is
    garbage. An explicit k_hi keeps the legacy fixed-K behavior.
    """
    @functools.partial(jax.jit, static_argnums=1)
    def chained(s, k):
        return jax.lax.fori_loop(0, k, lambda i, x: step_fn(x), s)

    def t_of(k, reps=repeats):
        np.asarray(jax.tree_util.tree_leaves(chained(state0, k))[0])  # warm
        best = None
        for _ in range(reps):
            out = chained(state0, k)
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    t_lo = t_of(k_lo)
    if k_hi is not None:
        t_hi = t_of(k_hi)
        return max((t_hi - t_lo) / (k_hi - k_lo), 1e-12)
    for k in (64, 4096, 131072):
        t_hi = t_of(k, reps=1 if k >= 4096 else repeats)
        if t_hi - t_lo >= min_delta or t_hi > 2.0:
            break
    return max((t_hi - t_lo) / (k - k_lo), 1e-12)
