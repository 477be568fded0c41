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


def chain_timer(step_fn, state0, k_lo: int = 1, k_hi: int = 51,
                repeats: int = 3) -> float:
    """Seconds per step_fn application.

    step_fn: state -> state (data-dependent so iterations can't collapse);
    state0: initial pytree of device arrays.
    """
    @functools.partial(jax.jit, static_argnums=1)
    def chained(s, k):
        return jax.lax.fori_loop(0, k, lambda i, x: step_fn(x), s)

    # warm both compilations
    np.asarray(jax.tree_util.tree_leaves(chained(state0, k_lo))[0])
    np.asarray(jax.tree_util.tree_leaves(chained(state0, k_hi))[0])

    def t_of(k):
        out = chained(state0, k)
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    t_lo = min(t_of(k_lo) for _ in range(repeats))
    t_hi = min(t_of(k_hi) for _ in range(repeats))
    return max((t_hi - t_lo) / (k_hi - k_lo), 1e-12)
