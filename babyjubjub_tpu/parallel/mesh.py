"""Device mesh construction for multi-chip/multi-host scaling.

The reference is single-threaded with no distribution (SURVEY.md section
2.3); here scaling is first-class: batches shard over a "data" axis, and
fixed-base comb windows can shard over a "win" axis (the tensor-parallel
analog for this domain). Within a slice the collectives ride ICI; across
hosts jax.distributed + DCN.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize_distributed(**kwargs):
    """Multi-host init (no-op when single-process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(n_devices: int | None = None, data_axis: str = "data",
              win_axis: str = "win", win: int = 1):
    """1D data mesh, or 2D (data, win) when win > 1."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n <= len(devs), f"need {n} devices, have {len(devs)}"
    auto = getattr(jax.sharding, "AxisType", None)
    if win == 1:
        kw = {"axis_types": (auto.Auto,)} if auto else {}
        return jax.make_mesh((n,), (data_axis,), devices=devs[:n], **kw)
    assert n % win == 0
    kw = {"axis_types": (auto.Auto, auto.Auto)} if auto else {}
    return jax.make_mesh((n // win, win), (data_axis, win_axis),
                         devices=devs[:n], **kw)
