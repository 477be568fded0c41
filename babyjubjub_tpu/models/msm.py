"""Multi-scalar multiplication: sum_i n_i * P_i over a point/scalar batch.

The reference has no MSM (every op is one point at a time); this is the
batch workload BASELINE.json's north star measures. Strategy: batched
windowed scalar-mul over all lanes (the fused a=-1 twist ladder), then a
log2(B) binary tree of batched point adds; sharded across the mesh via
parallel/sharded.msm_sharded (all_gather of per-device partial sums).

Why not Pippenger here (design note): classic bucket accumulation is a
scatter-by-digit, which SIMD lanes can't do without either (a) 2^w
masked tree-reductions per window — 64*16*B point adds, WORSE than the
ladder's ~318B — or (b) per-window sort + segmented associative scan,
whose ~2B combine point-adds per window net only ~1.8x at w=4 (~3.5x at
w=8) while adding device sorts and gathers on the minor axis. The fused
ladder already runs each lane at 1.25M+ scalar-muls/s/chip, so the
batched-ladder MSM is within ~2-3x of a much more complex scan-based
Pippenger; revisit if MSM-sum (rather than independent muls) becomes the
dominant workload.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import field as F, curve as C
from ..utils import hostmath as H

fq = F.fq()


def tree_reduce_points(proj):
    """Sum a projective batch (coords (16, B)) down to a single point.

    B is padded to a power of two with identities; log2(B) rounds of
    batched adds.
    """
    x, y, z = proj
    b = x.shape[-1]
    n = 1
    while n < b:
        n *= 2
    if n != b:
        pad = C.identity((n - b,))
        x = jnp.concatenate([x, pad[0]], axis=-1)
        y = jnp.concatenate([y, pad[1]], axis=-1)
        z = jnp.concatenate([z, pad[2]], axis=-1)
    p = (x, y, z)
    while n > 1:
        n //= 2
        lo = tuple(c[..., :n] for c in p)
        hi = tuple(c[..., n:] for c in p)
        p = C.add(lo, hi)
    return p  # coords (16, 1)


def msm_core(aff, scalars):
    """Device MSM: points (X, Y) (16, B) Montgomery affine, scalars (16, B)
    canonical (< 2^256, pre-reduced mod ORDER host-side if larger).
    Returns projective (16, 1) coords."""
    prods = C.scalar_mul_windowed(aff, scalars)
    return tree_reduce_points(prods)


_msm_jit = jax.jit(lambda aff, s: msm_core(aff, s))


def msm(points: list, scalars: list) -> tuple:
    """Host API: [(x, y)], [int] -> (x, y) ints."""
    aff = C.points_to_arrays(points)
    s = F.ints_to_array([int(n) % H.ORDER for n in scalars])
    proj = _msm_jit(aff, s)
    (x, y), = C.arrays_to_points(jax.jit(C.to_affine)(proj))
    return (x, y)
