"""Ablation: MXU-offloaded Montgomery fold-reduction vs the VPU word-serial
reduce (ROOFLINE.md "MXU Montgomery-reduction offload" lever, round-3).

Question: can the reduction half of mulmod13 ride the MXU *concurrently*
with the VPU product phase of neighboring independent multiplies, lifting
the fused-ladder throughput past its measured VPU roofline (~1.54 M
scalar-muls/s/chip)?

Design measured here (the ladder's real dependency shape):
  * state = 4 independent mont13 values per lane; each step multiplies
    every value by a fixed multiplier (4 independent muls per step, like
    the 4 squarings of a window's doubling block);
  * variant `vpu`: all 4 muls use the word-serial Montgomery reduce;
  * variant `fold3`: 3 of the 4 muls reduce via ONE pair of int8 MXU
    matmuls with a (120, 120) block-diagonal fold matrix (single 128x128
    MXU tile after padding), the 4th stays word-serial on the VPU so
    both units have work to overlap;
  * variant `mmonly`: the matmul pair alone, chained, to calibrate the
    standalone MXU rate at this exact shape.

Fold math (exact, no Montgomery quirks): after the Karatsuba product
phase, carry-normalize the 40 columns to 13-bit limbs t_0..t_39 (the
value a*b < 2^514 < 2^520, so the chain's final carry is 0). Then
  a*b * 2^-260 mod p == sum_j t_j * G_j  with  G_j = 2^(13j-260) mod p,
a CONSTANT linear map over limb space -- the same trick as the Poseidon
MXU MDS mix (fast13._poseidon_mxu_w): split limbs and matrix entries
7+6 bits so every operand is unsigned < 128, two int8 matmuls with i32
accumulation, recombine with shifts. The result value is < 40*2^13*p;
one carry + a split Barrett quotient lands it < 4p (lazy), vs < 2p from
the word-serial path -- callers here tolerate that (mul inputs < 10p).

Run on TPU:  python scripts/ablate_mxu_fold.py [--batch 8192] [--tile 1024]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from babyjubjub_tpu.ops.pallas import fast13 as FK
from babyjubjub_tpu.ops import field as F
from babyjubjub_tpu.utils import hostmath as H, timing

LB, N, MASK = FK.LB, FK.N, FK.MASK
P = H.Q
_u32, _i32 = jnp.uint32, jnp.int32

G = 3          # muls folded per matmul pair (K = M = 40*G = 120 <= 128)
KDIM = 40      # product columns per mul
ODIM = 2 * N   # output rows per mul: 2 planes x 20 columns


def _fold_matrix() -> np.ndarray:
    """(G*ODIM, G*KDIM) int8 block-diagonal fold matrix.

    Block rows [2*(c + 0..19)] plane 0 / plane 1; block cols j = product
    column index; entry = limb c of G_j = 2^(13j - 260) mod p, split 7+6.
    """
    rinv = pow(1 << (LB * N), P - 2, P)
    blk = np.zeros((ODIM, KDIM), dtype=np.int8)
    for j in range(KDIM):
        gj = FK.int_to_limbs13(pow(2, LB * j, P) * rinv % P)
        for c in range(N):
            blk[c, j] = gj[c] & 0x7F
            blk[N + c, j] = gj[c] >> 7
    w = np.zeros((G * ODIM, G * KDIM), dtype=np.int8)
    for b in range(G):
        w[b * ODIM:(b + 1) * ODIM, b * KDIM:(b + 1) * KDIM] = blk
    return w


# Barrett tail constants. The quotient q < 2^18.4 makes both the hi*MU
# product (2^25.4 * 2^17.3) and the q*p_limb products (2^18.4 * 2^13)
# overflow u32/i32, so BOTH multiplies are split: the quotient estimate
# as q = (h1*MU >> 11) + (h0*MU >> 23) with hi = h1*2^12 + h0, and the
# subtraction as q = q1*64 + q0 against renormalized limbs of 64p and p
# (each partial product < 2^25.5, i32-exact). The estimate undershoots
# the true quotient by at most 3, landing the result < 4p.
MU270 = (1 << 270) // P
assert MU270 < (1 << 18)
P64_13 = FK.int_to_limbs13(64 * P)


def emit_fold_tail(cols):
    """20 u32 fold columns (< 2^31.5 each, value < 2^18.4 * p) -> 13-bit
    normalized limbs, value < 4p."""
    d = FK._carry_n(cols, N + 1)              # 21 limbs; d[20] < 2^12.4
    hi = (d[N] << LB) | d[19]                 # bits >= 247; < 2^25.4
    h1 = hi >> 12
    h0 = hi & _u32((1 << 12) - 1)
    qh = ((h1 * _u32(MU270)) >> 11) + ((h0 * _u32(MU270)) >> 23)
    q1 = qh >> 6
    q0 = qh & _u32(63)
    out = []
    borrow = None
    for k in range(N):
        v = (d[k].astype(_i32)
             - (q1 * _u32(P64_13[k])).astype(_i32)
             - (q0 * _u32(FK.P13[k])).astype(_i32))
        if k == N - 1:
            v = v + ((d[N] << LB).astype(_i32))  # fold d20 into the top limb
        if borrow is not None:
            v = v + borrow
        out.append((v & MASK).astype(_u32))
        borrow = v >> LB
    return out


def emit_mul13_fold3(pairs, w, u8, v8, d0, d1, tile):
    """3 independent muls: VPU product phase + carry, ONE int8 matmul pair
    for all 3 Montgomery folds, VPU recombine + Barrett tail.

    pairs: [(a, b)] * 3 of 13-bit-normalized limb vectors (< 10p).
    w: (G*ODIM, G*KDIM) int8 fold matrix (from _fold_matrix).
    u8/v8: (G*KDIM, tile) int8 scratch; d0/d1: (G*ODIM, tile) int32 scratch.
    Returns 3 results, < 4p, 13-bit normalized.
    """
    zero = jnp.zeros_like(pairs[0][0][0])
    for i, (a, b) in enumerate(pairs):
        cols = [zero if c is None else c
                for c in FK._emit_kara_cols(a, b, sq=b is None)]
        t = FK._carry_n(cols, KDIM)           # value < 2^514.4 < 2^520: exact
        for j in range(KDIM):
            u8[i * KDIM + j, :] = (t[j] & 0x7F).astype(jnp.int8)
            v8[i * KDIM + j, :] = (t[j] >> 7).astype(jnp.int8)
    dn = (((1,), (0,)), ((), ()))
    d0[...] = jax.lax.dot_general(w, u8[...], dn,
                                  preferred_element_type=jnp.int32)
    d1[...] = jax.lax.dot_general(w, v8[...], dn,
                                  preferred_element_type=jnp.int32)
    outs = []
    for i in range(len(pairs)):
        base = i * ODIM
        cols = []
        for c in range(N):
            lo = d0[base + c, :].astype(_u32)
            mid = (d0[base + N + c, :] + d1[base + c, :]).astype(_u32)
            hic = d1[base + N + c, :].astype(_u32)
            cols.append(lo + (mid << 7) + (hic << 14))
        outs.append(emit_fold_tail(cols))
    return outs


def _mk_mult_consts(seed=7):
    rng = np.random.RandomState(seed)
    ms = []
    for _ in range(4):
        v = int.from_bytes(rng.bytes(32), "little") % P
        ms.append(FK.int_to_limbs13(v * FK.R13 % P))
    return ms


def _load_state(x_ref):
    """x_ref: (4, N, tile) u32 -> 4 limb-vector lists."""
    return [[x_ref[i, k, :] for k in range(N)] for i in range(4)]


def _store_state(o_ref, vals):
    for i in range(4):
        for k in range(N):
            o_ref[i, k, :] = vals[i][k]


def _vpu_kernel(x_ref, o_ref, *, nstep):
    ms = [[jnp.full_like(x_ref[0, 0, :], int(c)) for c in m]
          for m in _mk_mult_consts()]

    def body(_, vs):
        return [FK.emit_mul13(v, m) for v, m in zip(vs, ms)]

    vals = jax.lax.fori_loop(0, nstep, body, _load_state(x_ref))
    _store_state(o_ref, vals)


def _fold3_kernel(x_ref, w_ref, o_ref, u8, v8, d0, d1, *, nstep, tile):
    ms = [[jnp.full_like(x_ref[0, 0, :], int(c)) for c in m]
          for m in _mk_mult_consts()]
    w = w_ref[...]

    def body(_, vs):
        f = emit_mul13_fold3([(vs[i], ms[i]) for i in range(3)],
                             w, u8, v8, d0, d1, tile)
        s = FK.emit_mul13(vs[3], ms[3])       # VPU keeps the 4th lane
        return [f[0], f[1], f[2], s]

    vals = jax.lax.fori_loop(0, nstep, body, _load_state(x_ref))
    _store_state(o_ref, vals)


def _mmonly_kernel(x_ref, w_ref, o_ref, u8, v8, d0, d1, *, nstep, tile):
    w = w_ref[...]
    for j in range(G * KDIM):
        u8[j, :] = (x_ref[0, j % N, :] & 0x7F).astype(jnp.int8)
        v8[j, :] = (x_ref[0, j % N, :] >> 7).astype(jnp.int8)
    dn = (((1,), (0,)), ((), ()))

    def body(_, acc):
        d0[...] = jax.lax.dot_general(w, u8[...], dn,
                                      preferred_element_type=jnp.int32)
        d1[...] = jax.lax.dot_general(w, v8[...], dn,
                                      preferred_element_type=jnp.int32)
        acc = acc + d0[0, :].astype(_u32) + d1[0, :].astype(_u32)
        u8[0, :] = (acc & 0x7F).astype(jnp.int8)  # loop-carried dependence
        return acc

    acc = jax.lax.fori_loop(0, nstep, body,
                            jnp.zeros_like(x_ref[0, 0, :]))
    for i in range(4):
        for k in range(N):
            o_ref[i, k, :] = acc


_INTERPRET = bool(os.environ.get("ABLATE_INTERPRET"))  # CPU correctness runs


def _run(kind, x, w, tile, nstep):
    bsize = x.shape[2]
    bs = pl.BlockSpec((4, N, tile), lambda i: (0, 0, i),
                      memory_space=pltpu.VMEM)
    ws = pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct(x.shape, jnp.uint32)
    scratch = [pltpu.VMEM((G * KDIM, tile), jnp.int8),
               pltpu.VMEM((G * KDIM, tile), jnp.int8),
               pltpu.VMEM((G * ODIM, tile), jnp.int32),
               pltpu.VMEM((G * ODIM, tile), jnp.int32)]
    if kind == "vpu":
        return pl.pallas_call(
            functools.partial(_vpu_kernel, nstep=nstep),
            out_shape=out, grid=(bsize // tile,), interpret=_INTERPRET,
            in_specs=[bs], out_specs=bs)(x)
    kern = {"fold3": _fold3_kernel, "mmonly": _mmonly_kernel}[kind]
    return pl.pallas_call(
        functools.partial(kern, nstep=nstep, tile=tile),
        out_shape=out, grid=(bsize // tile,), interpret=_INTERPRET,
        in_specs=[bs, ws], out_specs=bs,
        scratch_shapes=scratch)(x, w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--nstep", type=int, default=16)
    ap.add_argument("--check-only", action="store_true",
                    help="correctness check only (CPU interpret runs)")
    args = ap.parse_args()
    B, tile, nstep = args.batch, args.tile, args.nstep

    rng = np.random.RandomState(3)
    xs = np.zeros((4, N, B), dtype=np.uint32)
    vals = np.zeros((4, B), dtype=object)
    for i in range(4):
        for b in range(B):
            v = int.from_bytes(rng.bytes(32), "little") % P
            vals[i, b] = v * FK.R13 % P
            for k, c in enumerate(FK.int_to_limbs13(int(vals[i, b]))):
                xs[i, k, b] = c
    x = jax.device_put(xs)
    w = jax.device_put(_fold_matrix())

    # correctness first: one step of fold3 vs int model (spot lanes)
    ms_int = []
    for m in _mk_mult_consts():
        ms_int.append(sum(int(c) << (LB * k) for k, c in enumerate(m)))
    r13inv = pow(FK.R13, P - 2, P)
    got = np.asarray(_run("fold3", x, w, tile, 1))
    for i in range(4):
        for b in range(0, B, max(1, B // 7)):
            lim = [int(got[i, k, b]) for k in range(N)]
            gv = sum(c << (LB * k) for k, c in enumerate(lim))
            want = int(vals[i, b]) * ms_int[i] % P * r13inv % P
            assert gv % P == want, (i, b, gv % P, want)
            assert gv < 4 * P, (i, b, "lazy bound", gv // P)
    print(json.dumps({"check": "fold3 matches int model, < 4p", "ok": True}),
          flush=True)
    if args.check_only:
        return

    res = {"batch": B, "tile": tile, "nstep": nstep}
    for kind in ("vpu", "fold3", "mmonly"):
        def step(s, _kind=kind):
            return _run(_kind, s, w, tile, nstep)
        dt = timing.chain_timer(step, x, 1, None)
        per_mul = dt / (nstep * 4) / B  # fold3: counts 4 muls/step too
        res[kind] = {"sec_per_call": round(dt, 6),
                     "eff_mulmods_per_sec": round(4 * nstep * B / dt, 1)}
        print(json.dumps({kind: res[kind]}), flush=True)

    res["verdict"] = ("fold3 wins" if res["fold3"]["eff_mulmods_per_sec"]
                      > 1.05 * res["vpu"]["eff_mulmods_per_sec"]
                      else "vpu word-serial stays")
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
