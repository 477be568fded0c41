"""Sharded batch pipelines: shard_map over the device mesh.

Parallelism axes (SURVEY.md section 2.3 mapping):
  * data ("dp"): the primary axis — signature/point batches shard over it;
    verification is embarrassingly parallel, MSM reduces partial sums via
    an all_gather of one point per device (rides ICI).
  * win ("tp" analog): fixed-base comb windows are an independent group
    sum, so they shard across a second mesh axis; partials combine with
    log2 point adds after an all_gather over the axis.

There is no sequence/pipeline/expert dimension in this domain (documented
in SURVEY.md sections 2.3/5.7); batch and window cover the hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map as _shard_map  # jax >= 0.6 style

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

from ..ops import field as F, curve as C
from ..models import eddsa, msm as msm_mod

_LIMB_B = P(None, "data")  # (16, B) arrays: shard batch, replicate limbs


def verify_sharded(mesh):
    """Batch-verify jitted over the mesh: inputs (16, B) sharded on data."""
    f = shard_map(
        eddsa.verify_core, mesh,
        in_specs=(_LIMB_B,) * 6,
        out_specs=P("data"),
    )
    return jax.jit(f)


def sign_sharded(mesh):
    f = shard_map(
        eddsa.sign_core, mesh,
        in_specs=(_LIMB_B,) * 4,
        out_specs=(_LIMB_B, _LIMB_B, _LIMB_B),
    )
    return jax.jit(f)


def scalar_mul_sharded(mesh):
    """Variable-base batch scalar-mul sharded on data -> affine coords."""
    f = shard_map(
        lambda x, y, s: C.to_affine(C.scalar_mul_windowed((x, y), s)),
        mesh,
        in_specs=(_LIMB_B, _LIMB_B, _LIMB_B),
        out_specs=(_LIMB_B, _LIMB_B),
    )
    return jax.jit(f)


def fixed_base_win_sharded(mesh, w: int = 4, nbits: int = 256):
    """Fixed-base comb with windows sharded over the "win" mesh axis.

    Each device sums its contiguous comb-window subset (the comb is a
    plain group sum over windows, so window subsets are independent);
    the per-shard partial points come back stacked over "win" and fold
    with log2(win) point adds outside the shard_map.
    """
    nwin_total = nbits // w
    win_size = mesh.shape["win"]
    assert nwin_total % win_size == 0
    local = nwin_total // win_size

    def body(scalars):
        wi = jax.lax.axis_index("win")
        part = C.fixed_base_mul(scalars, w=w, nbits=nbits,
                                win_offset=wi * local, nwin_local=local)
        return tuple(c[None] for c in part)    # (1, 16, B) per win-shard

    f = shard_map(
        body, mesh,
        in_specs=(P(None, "data"),),
        out_specs=(P("win", None, "data"),) * 3,
    )

    def run(scalars):
        gx, gy, gz = f(scalars)                # (win, 16, B) each
        # replicate the win axis so the fold can slice it
        repl = jax.sharding.NamedSharding(mesh, P(None, None, "data"))
        gx, gy, gz = (jax.lax.with_sharding_constraint(g, repl)
                      for g in (gx, gy, gz))
        acc = (gx[0], gy[0], gz[0])
        for k in range(1, win_size):
            acc = C.add(acc, (gx[k], gy[k], gz[k]))
        return C.to_affine(acc)

    return jax.jit(run)


def msm_sharded(mesh):
    """MSM with the batch sharded over "data": local windowed mul +
    tree-reduce per device; the one-point partials come back stacked
    over "data" and fold with a final tree of point adds.
    Returns projective coords (16, 1)."""

    def body(x, y, s):
        part = msm_mod.msm_core((x, y), s)     # (16, 1) coords local
        return part

    f = shard_map(
        body, mesh,
        in_specs=(_LIMB_B, _LIMB_B, _LIMB_B),
        out_specs=(_LIMB_B,) * 3,              # (16, ndev) stacked partials
    )

    def run(x, y, s):
        px, py, pz = f(x, y, s)
        return msm_mod.tree_reduce_points((px, py, pz))

    return jax.jit(run)
