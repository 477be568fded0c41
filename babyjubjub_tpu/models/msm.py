"""Multi-scalar multiplication: sum_i n_i * P_i over a point/scalar batch.

The reference has no MSM (every op is one point at a time); this is the
batch workload BASELINE.json's north star measures. Two engines:

* ``msm_ladder_core`` (the DEFAULT at every size): batched windowed
  scalar-mul over all lanes (the fused signed-window ladder, fully
  VMEM-resident), then a log2(B) tree of batched point adds.

* ``msm_pippenger_core`` (exact, tested, opt-in): per-window bucket
  accumulation via sort + prefix-scan algebra. Classic Pippenger
  scatters points into 2^w buckets — a data-dependent scatter SIMD
  lanes can't do — so the bucket sums are recovered as:

    1. per window j: digit_i = bits [wj, wj+w) of scalar_i (device-side,
       static per-window extraction from the 16-bit limbs);
    2. argsort lanes by digit; gather points into digit order;
    3. inclusive prefix scan of the sorted points under the COMPLETE
       unified Edwards addition (jax.lax.associative_scan; widths >= the
       pallas tile ride the fused point-add kernel, log-depth);
    4. bucket b's sum = cum[e_b] - cum[e_{b-1}] where e_b = #digits <= b
       (searchsorted on the sorted digit vector; empty buckets cancel to
       the identity automatically, and group subtraction is a negate+add
       — negation on twisted Edwards is just x -> -x);
    5. sum_b b*S_b via the standard suffix-sum trick: reverse-scan the
       buckets, then tree-reduce the suffix sums;
    6. Horner-combine the window sums: R = 2^w R + W_j.

  MEASURED VERDICT (v5e, 2026-08-17, scripts/msm_timing.py): at
  B=16384 the ladder took 22.7 ms/MSM (722k pt-muls/s) and Pippenger
  2529 ms — group-op counting favors Pippenger ~5x, but every saved
  add is repaid >100x in data movement: per-lane gathers
  (jnp.take along the lane axis for the sort permutation and the 2^w
  bucket extraction) and the strided odd/even slices of the scan have
  no efficient TPU lowering, while the ladder never leaves VMEM. The
  round-1 design note anticipated this; the measurement settles it.
  Engines agree bit-exactly on TPU at B=16384 and on CPU at all
  tested sizes, so the implementation stands as a verified reference
  for any future memory-layout rework (e.g. bucketing on the sublane
  axis or an on-chip sort), but the ladder is the production engine.

Both engines are exact (bit-identical to the host BigInt model) and
sharded across the mesh via parallel/sharded.msm_sharded (per-device
partials combined with point adds — the only collective is the gather
of one point per device, riding ICI).

ROUND-5 TAIL FIX (v5e, artifacts/msm_r05.log): the ladder engine's
reduction now runs in ONE fused kernel (pallas/point.point_sum — grid
accumulation + lane-roll butterfly, see tree_reduce_points below);
B=16384: 11.09 ms/MSM = 1.48M pt-muls/s (was 22.7 ms / 722k/s);
B=65536: 1.50M pt-muls/s — ~97%% of the raw batched-ladder rate, the
reduce tail is no longer measurable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import field as F, curve as C
from ..utils import hostmath as H

fq = F.fq()

# Pippenger never beats the fused ladder on TPU (see module docstring:
# 2529 vs 22.7 ms/MSM at B=16384) — lane-gather costs dwarf the saved
# group ops. None disables routing; set an int to re-enable for
# experiments.
PIPPENGER_MIN_B = None


def tree_reduce_points(proj):
    """Sum a projective batch (coords (16, B)) down to a single point.

    On TPU, batches >= the Pallas tile reduce in ONE fused kernel
    (pallas/point.point_sum): per-tile grid accumulation in VMEM
    scratch, then a lane-roll butterfly fold — every lane stays busy
    every step. The former log2(B) chain of separate adds spent 12 of
    22.7 ms per B=16384 MSM in its tail levels, which under-filled the
    512-lane tile and below it fell onto the generic-limb XLA adds
    (VERDICT r4 #5); measured after: see scripts/msm_timing.py /
    artifacts/msm_r05.log.

    CPU / sub-tile batches: identity-pad to a power of two, log2(B)
    rounds of batched adds (unchanged semantics, same group law).
    """
    x, y, z = proj
    b = x.shape[-1]
    tile = F._PALLAS_TILE
    if F._pallas_enabled() and x.ndim == 2 and b >= tile:
        from ..ops.pallas import point as PK
        if b % tile:
            pad = C.identity((tile - b % tile,))
            x, y, z = (jnp.concatenate([c, p], axis=-1)
                       for c, p in zip((x, y, z), pad))
        s = PK.point_sum(x, y, z)
        return tuple(c[:, :1] for c in s)
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


def _window_digits(scalars, w: int, nwin: int):
    """(16, B) canonical 16-bit-limb scalars -> (nwin, B) u32 digits,
    digit j = bits [w*j, w*j + w). Static extraction; a digit spans at
    most two limbs."""
    outs = []
    for j in range(nwin):
        lo = w * j
        a, s = lo // 16, lo % 16
        v = scalars[a] >> s
        if s + w > 16 and a + 1 < 16:
            v = v | (scalars[a + 1] << (16 - s))
        outs.append(v & jnp.uint32((1 << w) - 1))
    return jnp.stack(outs)


def _neg_proj(p):
    return (fq.neg(p[0]), p[1], p[2])


def msm_pippenger_core(aff, scalars, w: int = 8):
    """Device Pippenger MSM. aff: (X, Y) (16, B) Montgomery affine;
    scalars (16, B) canonical < 2^254 (reduce mod ORDER host-side).
    Returns projective (16, 1) coords."""
    x, y = aff
    bsize = x.shape[-1]
    nwin = -(-254 // w)
    nb = 1 << w
    digits = _window_digits(scalars, w, nwin)
    one = fq.one_mont((bsize,))
    ident1 = C.identity((1,))

    def window_sum(dj):
        perm = jnp.argsort(dj)
        ds = jnp.take(dj, perm)
        xs = jnp.take(x, perm, axis=1)
        ys = jnp.take(y, perm, axis=1)
        cum = jax.lax.associative_scan(C.add, (xs, ys, one), axis=1)
        # cum_ext[:, k] = sum of the first k sorted points (k = 0 empty)
        cum_ext = tuple(jnp.concatenate([i1, c], axis=1)
                        for i1, c in zip(ident1, cum))
        # e_b = #digits <= b; buckets b = 1 .. nb-1 (digit 0 contributes 0)
        ends = jnp.searchsorted(ds, jnp.arange(nb, dtype=jnp.uint32),
                                side="right")
        top = tuple(jnp.take(c, ends[1:], axis=1) for c in cum_ext)
        bot = tuple(jnp.take(c, ends[:-1], axis=1) for c in cum_ext)
        buckets = C.add(top, _neg_proj(bot))      # S_b, coords (16, nb-1)
        # sum_b b*S_b == sum_k (suffix sum T_k = S_k + ... + S_{nb-1})
        rev = tuple(c[:, ::-1] for c in buckets)
        suf = jax.lax.associative_scan(C.add, rev, axis=1)
        return tree_reduce_points(suf)            # (16, 1)

    _, wins = jax.lax.scan(lambda c, dj: (c, window_sum(dj)), None, digits)

    # Horner over windows: R = 2^w * R + W_j, top window first. A
    # fori_loop (not a python loop) keeps the graph at one body — the
    # unrolled form inlines ~nwin*(w+1) point ops and compiles for ages.
    def horner_body(i, r):
        j = nwin - 2 - i
        for _ in range(w):
            r = C.double(r)
        wj = tuple(jax.lax.dynamic_index_in_dim(c, j, axis=0, keepdims=False)
                   for c in wins)
        return C.add(r, wj)

    r0 = tuple(c[-1] for c in wins)
    return jax.lax.fori_loop(0, nwin - 1, horner_body, r0)


def msm_masked_core(aff, scalars, w: int = 2):
    """Gather-free bucket MSM (the round-4 memory-layout experiment).

    Pippenger's loss on TPU is data movement (argsort + lane gathers);
    this variant keeps buckets WITHOUT any gather: per window, bucket
    b's sum is an identity-masked tree-reduce of the whole batch
    (select(digit == b, P, identity) then log2(B) batched adds — all
    lanes stay in place). Op-count model per window: (2^w - 1) masked
    tree-reduces of ~B adds each, vs the ladder's w doubles + 1 add per
    lane; totals at B lanes:

        ladder  w=4:  (4+1)/4 * 256 * B  = 320 B point-ops
        masked  w=1:  256 windows * 1B   = 256 B (+ 256 shared doubles)
        masked  w=2:  128 windows * 3B   = 384 B
        masked  w=3:   86 windows * 7B   = 602 B

    so w<=2 is op-count-competitive, the doubles are amortized to ONE
    point per window (Horner runs on the combined point, not per lane),
    and there is zero lane traffic. What the model hides: the reduce
    tree halves the live batch each level, so the tail levels
    under-fill the 512-lane kernel tile while the ladder keeps every
    lane busy every step. Measured verdict: see module docstring /
    scripts/msm_timing.py --engine masked.
    """
    x, y = aff
    bsize = x.shape[-1]
    nwin = -(-254 // w)
    nb = 1 << w
    digits = _window_digits(scalars, w, nwin)          # (nwin, B)
    one = fq.one_mont((bsize,))
    ident = C.identity((bsize,))

    def window_sum(dj):
        # buckets 1..nb-1 (digit 0 contributes nothing)
        parts = []
        for b in range(1, nb):
            sel = (dj == jnp.uint32(b))
            pb = C.select(sel, (x, y, one), ident)
            parts.append(tree_reduce_points(pb))       # (16, 1)
        # sum_b b * S_b via suffix sums: T_k = S_k + .. + S_{nb-1}
        acc = parts[-1]
        out = parts[-1]
        for b in range(nb - 3, -1, -1):
            acc = C.add(acc, parts[b])
            out = C.add(out, acc)
        return out if nb > 2 else parts[0]

    _, wins = jax.lax.scan(lambda c, dj: (c, window_sum(dj)), None, digits)

    def horner_body(i, r):
        j = nwin - 2 - i
        for _ in range(w):
            r = C.double(r)
        wj = tuple(jax.lax.dynamic_index_in_dim(c, j, axis=0, keepdims=False)
                   for c in wins)
        return C.add(r, wj)

    r0 = tuple(c[-1] for c in wins)
    return jax.lax.fori_loop(0, nwin - 1, horner_body, r0)


def msm_ladder_core(aff, scalars):
    """Ladder MSM: batched windowed scalar-mul + tree reduction."""
    prods = C.scalar_mul_windowed(aff, scalars)
    return tree_reduce_points(prods)


def msm_core(aff, scalars):
    """Engine selection (both exact; ladder wins at every measured size)."""
    if PIPPENGER_MIN_B is not None and \
            aff[0].shape[-1] >= PIPPENGER_MIN_B:
        return msm_pippenger_core(aff, scalars)
    return msm_ladder_core(aff, scalars)


_msm_jit = jax.jit(lambda aff, s: msm_core(aff, s))
_msm_pip_jit = jax.jit(functools.partial(msm_pippenger_core, w=8))
_msm_lad_jit = jax.jit(msm_ladder_core)


def msm(points: list, scalars: list) -> tuple:
    """Host API: [(x, y)], [int] -> (x, y) ints."""
    aff = C.points_to_arrays(points)
    s = F.ints_to_array([int(n) % H.ORDER for n in scalars])
    proj = _msm_jit(aff, s)
    (x, y), = C.arrays_to_points(jax.jit(C.to_affine)(proj))
    return (x, y)
