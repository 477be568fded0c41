"""13-bit-limb fast path: Montgomery field ops + fused scalar-mul ladder.

Why 13-bit limbs beat the 16-bit path on the TPU VPU:

  * Products of 13-bit limbs are < 2^26, so a uint32 column accumulates up
    to ~37 product terms before overflow. The per-product split of the
    16-bit path (mask + shift + second add: 5 VPU ops per product) becomes
    2 ops (multiply + accumulate); splitting happens once per column at
    the end.
  * BN254 Fr has 2-adicity 28, i.e. p ≡ 1 (mod 2^26). In base 2^13 the
    modulus limbs are p[0] = 1 and p[1] = 0, and the word-level Montgomery
    constant is -p^{-1} ≡ -1 (mod 2^13). Each reduction round therefore
    needs NO multiply for m (m = (-t_i) mod 2^13), the j = 0 term is m
    itself, and the j = 1 term vanishes: 18 multiplies per round, not 20.
  * Lazy representation: all intermediate values are kept < k*p for small
    k (bounds below) with normalized 13-bit limbs; there are NO
    conditional subtracts anywhere inside point formulas or the ladder —
    one at the very end makes the result canonical.

Montgomery radix here is R13 = 2^260 (20 limbs x 13 bits). Conversion
from the framework-wide 16-bit Montgomery domain (R16 = 2^256) is a
left-shift by 4 bits (x*R16 << 4 = x*R13, value < 16p: a valid lazy
element); conversion back multiplies by the plain constant 2^256
(mont13_mul(v*R13, 2^256) = v*2^256 = v*R16).

Lazy-bound ledger for the bbjlp formulas (inputs < 2p, sub = a+(4p-b)):
  mul/sq outputs   < ab/R13 + p      <= 1.7p   (worst product 56p^2)
  add outputs      < 4.2p
  sub outputs      < 9.3p  < 2^257   (still 20 normalized limbs < 2^260)
  every mul input pair (a, b) observed satisfies ab < 57p^2 < p*R13,
  keeping mul outputs < 2p -- the invariant is closed. Product columns
  accumulate <= 20 (product phase) + 18 (reduction) terms of < 2^26 plus
  round carries: < 38*2^26 + 2^19 < 2^31.3 -- exact in uint32.

Reference parity: same group math as /root/reference/src/lib.rs:88-164
(add-2008-bbjlp unified add, dbl-2008-bbjlp, windowed ladder replacing
the LSB-first double-and-add); results are bit-identical after the
canonical conversion at the exit.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import field as F
from ...utils import hostmath as H

LB = 13
N = 20
MASK = (1 << LB) - 1

_u32 = jnp.uint32
_i32 = jnp.int32

P = H.Q
R13 = 1 << (LB * N)  # 2^260

# Trace-time switch: lower every pallas_call in this module through the
# XLA interpret path (CPU-runnable) instead of Mosaic. CI plumbing tests
# (tests/test_fast13_kernels.py) flip this to validate grids, BlockSpec
# index maps, and scratch persistence without a TPU; the op-by-op
# pltpu.force_tpu_interpret_mode is too slow for these ~50k-op kernels.
INTERPRET = False


def set_interpret(value: bool) -> None:
    """Toggle interpret-mode lowering. INTERPRET is read at trace time and
    is NOT part of any jit cache key, so flipping the bare global after a
    shape has been traced would silently reuse the previous lowering —
    this setter clears the jit caches on every actual change."""
    global INTERPRET
    if bool(value) != INTERPRET:
        INTERPRET = bool(value)
        jax.clear_caches()


def _pallas_call(*args, **kwargs):
    return pl.pallas_call(*args, interpret=INTERPRET, **kwargs)


def int_to_limbs13(x: int) -> tuple:
    assert 0 <= x < R13
    return tuple((x >> (LB * k)) & MASK for k in range(N))


P13 = int_to_limbs13(P)
assert P13[0] == 1 and P13[1] == 0, "needs 2-adicity >= 26"
assert (-pow(P, -1, 1 << LB)) % (1 << LB) == MASK  # ninv == -1 mod 2^13
P13_4 = int_to_limbs13(4 * P)
ONE_M13 = int_to_limbs13(R13 % P)
TO_R16 = int_to_limbs13(1 << 256)  # plain 2^256: mont13-mul by it => mont16


# ---------------------------------------------------------------------------
# Emitters: operate on python lists of N (tile,)-shaped u32 vectors
# ---------------------------------------------------------------------------

def _emit_prod_cols(a, b):
    """Schoolbook column products: len(a)+len(b)-1 u32 columns."""
    na, nb = len(a), len(b)
    t = [None] * (na + nb - 1)
    for i in range(na):
        for j in range(nb):
            p = a[i] * b[j]
            k = i + j
            t[k] = p if t[k] is None else t[k] + p
    return t


def _emit_sq_cols(a):
    """Schoolbook squaring columns (diagonal + doubled off-diagonal)."""
    n = len(a)
    t = [None] * (2 * n - 1)
    u = [None] * (2 * n - 1)
    for i in range(n):
        p = a[i] * a[i]
        t[2 * i] = p if t[2 * i] is None else t[2 * i] + p
        for j in range(i + 1, n):
            p = a[i] * a[j]
            k = i + j
            u[k] = p if u[k] is None else u[k] + p
    out = []
    for k in range(2 * n - 1):
        if u[k] is None:
            out.append(t[k])
        elif t[k] is None:
            out.append(u[k] + u[k])
        else:
            out.append(t[k] + (u[k] + u[k]))
    return out


_KARA = 10  # Karatsuba split point (N = 20 -> two 10-limb halves)


def _emit_kara_cols(a, b, sq: bool):
    """Karatsuba column products for 20-limb operands: 300 multiplies
    (square: 165) instead of 400 (210).

    z0 = a0*b0, z2 = a1*b1, z1 = (a0+a1)*(b0+b1) - z0 - z2. Column-wise
    z1[m] = sum(a0_i*b1_j + a1_i*b0_j) (polynomial identity): a sum of
    <= 20 nonnegative products < 2^26, so the TRUE value fits positive
    i32 (< 2^30.4). The zm columns can exceed i32 max (10 products of
    (2^14-1)^2 ~ 2^31.3) and wrap negative under the i32 bitcast, but
    two's-complement add/sub is exact mod 2^32 and the true result is
    representable, so the subtraction still lands on the exact value.
    Recombined columns equal the schoolbook columns (< 20*2^26), so the
    _emit_reduce13 ledger (module docstring) is unchanged.
    """
    h = _KARA
    a0, a1 = a[:h], a[h:]
    if sq:
        z0 = _emit_sq_cols(a0)
        z2 = _emit_sq_cols(a1)
        asum = [x + y for x, y in zip(a0, a1)]   # < 2^14, no carry needed
        zm = _emit_sq_cols(asum)
    else:
        b0, b1 = b[:h], b[h:]
        z0 = _emit_prod_cols(a0, b0)
        z2 = _emit_prod_cols(a1, b1)
        asum = [x + y for x, y in zip(a0, a1)]
        bsum = [x + y for x, y in zip(b0, b1)]
        zm = _emit_prod_cols(asum, bsum)
    # z1 = zm - z0 - z2 (i32; column-wise nonnegative, see above)
    z1 = [(m.astype(_i32) - z0[k].astype(_i32) - z2[k].astype(_i32))
          for k, m in enumerate(zm)]
    t = [None] * (2 * N)
    for k, v in enumerate(z0):
        t[k] = v
    for k, v in enumerate(z1):
        kk = k + h
        t[kk] = v.astype(_u32) if t[kk] is None else t[kk] + v.astype(_u32)
    for k, v in enumerate(z2):
        kk = k + 2 * h
        t[kk] = v if t[kk] is None else t[kk] + v
    return t


def emit_mul13(a, b):
    """Lazy Montgomery mul: inputs 13-bit-normalized limbs, values < ~10p;
    output < 2p, 13-bit-normalized. Karatsuba product phase (300 muls) +
    word-serial reduction; ~600 product + ~820 reduce VPU ops."""
    return _emit_reduce13(_emit_kara_cols(a, b, sq=False))


def emit_sq13(a):
    """Squaring: Karatsuba over the 165-product halves (was 210)."""
    return _emit_reduce13(_emit_kara_cols(a, None, sq=True))


def emit_mul13_schoolbook(a, b):
    """Pre-Karatsuba multiplier (400 products), kept for ablation.
    _emit_reduce13 expects exactly 2N columns; pad the 2N-1 real ones."""
    return _emit_reduce13(_emit_prod_cols(a, b) + [None])


def emit_sq13_schoolbook(a):
    return _emit_reduce13(_emit_sq_cols(a) + [None])


def _emit_reduce13(t):
    """Montgomery reduction of 2N lazily-accumulated columns (< 2^31.3).

    Exploits p[0] == 1, p[1] == 0, ninv == -1: per round, m = (-t_i) mod
    2^13 with no multiply, and only limbs 2..N-1 of p contribute products.
    """
    t = list(t)
    zero = None
    for i in range(N):
        ti = t[i]
        if ti is None:
            ti = zero
        if ti is None:
            continue  # t[i] identically zero: m == 0, nothing to add
        if zero is None:
            zero = ti * 0
        m = (zero - ti) & MASK
        c = (ti + m) >> LB
        t[i + 1] = c if t[i + 1] is None else t[i + 1] + c
        for j in range(2, N):
            p = m * _u32(P13[j])
            k = i + j
            t[k] = p if t[k] is None else t[k] + p
    res = t[N:]
    res = [zero if v is None else v for v in res]
    return emit_carry13(res)


def emit_carry13(cols):
    """Normalize N u32 columns to 13-bit limbs (value must fit 2^260)."""
    out = []
    c = None
    for k in range(N):
        v = cols[k] if c is None else cols[k] + c
        out.append(v & MASK)
        c = v >> LB
    return out


def emit_add13(a, b):
    return emit_carry13([x + y for x, y in zip(a, b)])


def emit_sub13(a, b):
    """a - b mod p via a + (4p - b); requires value(b) < 4p."""
    out = []
    c = None
    for k in range(N):
        v = a[k].astype(_i32) + _i32(P13_4[k]) - b[k].astype(_i32)
        if c is not None:
            v = v + c
        out.append((v & MASK).astype(_u32))
        c = v >> LB  # arithmetic shift: handles negative partials
    return out


def emit_mul_const13(c_limbs, b):
    c = [jnp.full_like(b[0], int(v)) for v in c_limbs]
    return emit_mul13(c, b)


# Fold/Barrett constants for the small-constant multiply
K260 = ONE_M13                          # 2^260 mod p
K273 = int_to_limbs13((1 << 273) % P)   # 2^273 mod p
MU270 = (1 << 270) // P                 # Barrett mu, 17 bits
assert MU270 < (1 << 18)


def emit_mul_small13(c: int, x):
    """(c * x) mod-p-lazy for a SMALL plain-domain constant c < 2^26.

    A plain-integer multiply keeps the Montgomery domain (c * x*R = (cx)*R),
    so the curve coefficients a = 168700, d = 168696 (reference lib.rs:28-45)
    cost ~490 VPU ops here instead of a full ~1680-op Montgomery multiply.
    Input x: 13-bit-normalized limbs, value < 2^258. Output < 3p.

    Reduction: two constant folds of limbs 20/21 (2^260, 2^273 mod p), then
    a Barrett quotient estimate q^ = (floor(d/2^247) * floor(2^270/p)) >> 23
    with q - 2 <= q^ <= q, landing the result in [0, 3p).
    """
    assert 0 < c < (1 << 2 * LB)
    c0, c1 = c & MASK, c >> LB
    t = []
    for k in range(N + 2):
        v = None
        if k < N:
            v = _u32(c0) * x[k]
        if c1 and 0 <= k - 1 < N:
            w = _u32(c1) * x[k - 1]
            v = w if v is None else v + w
        t.append(v if v is not None else jnp.zeros_like(x[0]))
    # normalize 22 columns (value < 2^26 * 2^258 = 2^284 < 2^286)
    t = _carry_n(t, N + 2)
    # fold limbs 20, 21: value -> < 2^260 + 2*2^13*p < 2^268
    d = [t[k] +
         t[N] * _u32(K260[k]) +
         t[N + 1] * _u32(K273[k]) for k in range(N)]
    d = _carry_n(d, N + 1)
    # fold limb 20 again (< 2^8): value -> < 2^260 + 2^8*p < 2^262
    d = [d[k] + d[N] * _u32(K260[k]) for k in range(N)]
    d = _carry_n(d, N + 1)
    # Barrett: q^ = (hi * mu) >> 23 with hi = d >> 247; error <= 1
    hi = (d[N] << LB) | d[19]
    qh = (hi * _u32(MU270)) >> 23
    out = []
    borrow = None
    for k in range(N):
        v = d[k].astype(_i32) - (qh * _u32(P13[k])).astype(_i32)
        if borrow is not None:
            v = v + borrow
        out.append((v & MASK).astype(_u32))
        borrow = v >> LB
    return out


def _carry_n(cols, n):
    """Normalize to n 13-bit limbs; columns beyond len(cols) are carry-only."""
    out = []
    c = None
    for k in range(n):
        if k < len(cols):
            v = cols[k] if c is None else cols[k] + c
        else:
            v = c
        out.append(v & MASK)
        c = v >> LB
    return out


def emit_cond_sub13(a):
    """One conditional subtract of p (canonicalizes values < 2p)."""
    diff = []
    borrow = None
    for k in range(N):
        d = a[k].astype(_i32) - _i32(P13[k])
        if borrow is not None:
            d = d - borrow
        diff.append((d & MASK).astype(_u32))
        borrow = (d >> LB) & 1
    ge = borrow == 0
    return [jnp.where(ge, dk, ak) for dk, ak in zip(diff, a)]


# ---------------------------------------------------------------------------
# 16-bit <-> 13-bit repacking (pure bit plumbing, value-preserving)
# ---------------------------------------------------------------------------

def emit_repack_16to13(l16):
    """16 x 16-bit limb vectors -> 20 x 13-bit limb vectors (same value)."""
    out = []
    for j in range(N):
        bit = LB * j
        a, s = bit >> 4, bit & 15
        v = l16[a] >> s
        if s > 3 and a + 1 < 16:
            v = v | (l16[a + 1] << (16 - s))
        out.append(v & MASK)
    return out


def emit_repack_13to16(l13):
    """20 x 13-bit limbs (canonical) -> 16 x 16-bit limbs (same value)."""
    out = []
    for a in range(16):
        bit = 16 * a
        j, s = bit // LB, bit % LB
        v = l13[j] >> s
        have = LB - s
        if j + 1 < N:
            v = v | (l13[j + 1] << have)
            have += LB
        if have < 16 and j + 2 < N:
            v = v | (l13[j + 2] << have)
        out.append(v & jnp.uint32(0xFFFF))
    return out


def emit_shl4_13(l13):
    """Value << 4 on 13-bit limbs (input < 2^256). mont16 -> mont13."""
    out = []
    for j in range(N):
        v = l13[j] << 4
        if j > 0:
            v = v | (l13[j - 1] >> (LB - 4))
        out.append(v & MASK)
    return out


# ---------------------------------------------------------------------------
# Point formulas (projective twisted Edwards, lazy 13-limb Montgomery)
# ---------------------------------------------------------------------------

def emit_point_add13(p, q):
    """Unified add-2008-bbjlp (reference lib.rs:88-131)."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    a = emit_mul13(z1, z2)
    b = emit_sq13(a)
    c = emit_mul13(x1, x2)
    d = emit_mul13(y1, y2)
    e = emit_mul13(emit_mul_small13(H.D_COEFF, c), d)
    f = emit_sub13(b, e)
    g = emit_add13(b, e)
    aux = emit_sub13(emit_sub13(
        emit_mul13(emit_add13(x1, y1), emit_add13(x2, y2)), c), d)
    x3 = emit_mul13(emit_mul13(a, f), aux)
    dac = emit_sub13(d, emit_mul_small13(H.A_COEFF, c))
    y3 = emit_mul13(emit_mul13(a, g), dac)
    z3 = emit_mul13(f, g)
    return (x3, y3, z3)


def emit_point_double13(p):
    """dbl-2008-bbjlp: 3M + 4S + const-mul."""
    x1, y1, z1 = p
    b = emit_sq13(emit_add13(x1, y1))
    c = emit_sq13(x1)
    d = emit_sq13(y1)
    e = emit_mul_small13(H.A_COEFF, c)
    f = emit_add13(e, d)
    h = emit_sq13(z1)
    j = emit_sub13(f, emit_add13(h, h))
    x3 = emit_mul13(emit_sub13(emit_sub13(b, c), d), j)
    y3 = emit_mul13(f, emit_sub13(e, d))
    z3 = emit_mul13(f, j)
    return (x3, y3, z3)


# ---------------------------------------------------------------------------
# Mega-ladder: full windowed variable-base scalar mul in one kernel
# ---------------------------------------------------------------------------

W = 4
TSIZE = 1 << W
NWIN = 256 // W



def _pick_tile(b: int, cap: int) -> int:
    """Largest power-of-two tile <= cap dividing b (>= 512 when possible).

    Bigger tiles fill vregs dramatically better (measured: the w=4 ladder
    doubles going 512 -> 2048); caps are VMEM-bound per kernel (the
    ladder's per-lane table is 16*3*20*tile*4B: 7.9 MB at 2048)."""
    t = cap
    while t > 512 and b % t:
        t //= 2
    return t


def _ladder13_kernel(x_ref, y_ref, s_ref, ox, oy, oz, tab):
    """x/y: (16, tile) mont16 affine; s: (16, tile) canonical scalars.
    Outputs (16, tile) mont16 projective. tab: (TSIZE, 3, N, tile) VMEM."""
    one = [jnp.full_like(x_ref[0, :], int(v)) for v in ONE_M13]
    zero = [jnp.zeros_like(x_ref[0, :]) for _ in range(N)]

    # entry repack: mont16 -> mont13 via 16->13 limbs then << 4
    px = emit_shl4_13(emit_repack_16to13([x_ref[k, :] for k in range(16)]))
    py = emit_shl4_13(emit_repack_16to13([y_ref[k, :] for k in range(16)]))

    ident = (zero, one, one)
    p1 = (px, py, one)

    def write_entry(d, pt):
        for c in range(3):
            for k in range(N):
                tab[d, c, k, :] = pt[c][k]

    write_entry(0, ident)
    write_entry(1, p1)
    cur = p1
    for d in range(2, TSIZE):
        cur = emit_point_add13(cur, p1)
        write_entry(d, cur)

    def read_entry_onehot(digit):
        acc = [[None] * N for _ in range(3)]
        for d in range(TSIZE):
            m = (digit == _u32(d)).astype(_u32)
            for c in range(3):
                for k in range(N):
                    v = m * tab[d, c, k, :]
                    acc[c][k] = v if acc[c][k] is None else acc[c][k] + v
        return (acc[0], acc[1], acc[2])

    def body(j, r):
        rx, ry, rz = r
        for _ in range(W):
            rx, ry, rz = emit_point_double13((rx, ry, rz))
        bitpos = (NWIN - 1 - j) * W
        limb = s_ref[bitpos // 16, :]
        digit = (limb >> _u32(bitpos % 16)) & _u32(TSIZE - 1)
        t = read_entry_onehot(digit)
        return emit_point_add13((rx, ry, rz), t)

    r = jax.lax.fori_loop(0, NWIN, body, ident)

    # exit: mont13 lazy (< 2p) -> mont16 canonical -> 16-bit limbs
    to16 = [jnp.full_like(x_ref[0, :], int(v)) for v in TO_R16]
    for ref, limbs in ((ox, r[0]), (oy, r[1]), (oz, r[2])):
        m16 = emit_cond_sub13(emit_mul13(limbs, to16))
        l16 = emit_repack_13to16(m16)
        for k in range(16):
            ref[k, :] = l16[k]


@functools.partial(jax.jit, static_argnames=("tile",))
def scalar_mul_fused13(x, y, s, tile: int = 0):
    """(16, B) mont16 affine points x canonical scalars -> mont16 projective.

    Non-twist baseline ladder (bbjlp formulas on the original curve),
    kept for ablation/cross-checking; production routing uses
    scalar_mul_fused_tw13 (~10% fewer VPU ops via the a=-1 twist).
    """
    bsize = x.shape[1]
    tile = tile or _pick_tile(bsize, 2048)
    bs = pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    sh = jax.ShapeDtypeStruct(x.shape, jnp.uint32)
    return _pallas_call(
        _ladder13_kernel,
        out_shape=(sh, sh, sh),
        grid=(bsize // tile,),
        in_specs=[bs, bs, bs],
        out_specs=(bs, bs, bs),
        scratch_shapes=[pltpu.VMEM((TSIZE, 3, N, tile), jnp.uint32)],
    )(x, y, s)


# ---------------------------------------------------------------------------
# Fused fixed-base comb: 64 table-selected mixed adds, no doublings
# (reference hot loops lib.rs:305, 329, 405 — B8 multiplications)
# ---------------------------------------------------------------------------

_TROW = 64  # packed row: x limbs [0:20], y limbs [20:40], zero pad to 64


@functools.lru_cache(maxsize=None)
def _comb_table13(base: tuple, w: int = W, nbits: int = 256) -> np.ndarray:
    """(nwin, 64, 2^w) u32: entry [j, :, d] = d * 2^(w*j) * base on the
    a=-1 twist in ed25519 precomputed-affine form: rows 0:20 u = y - s*x,
    20:40 v = y + s*x, 40:60 k = 2d'*(s*x)*y, all mont13 canonical.
    Digit rides the lane axis so per-digit extracts are scalar reads."""
    nwin = nbits // w
    tsize = 1 << w
    out = np.zeros((nwin, _TROW, tsize), dtype=np.uint32)
    step = base
    for j in range(nwin):
        acc = H.IDENTITY
        for d in range(tsize):
            xt = acc[0] * _S_TWIST % P
            out[j, :N, d] = int_to_limbs13((acc[1] - xt) % P * R13 % P)
            out[j, N:2 * N, d] = int_to_limbs13((acc[1] + xt) % P * R13 % P)
            out[j, 2 * N:3 * N, d] = int_to_limbs13(
                2 * _D_TW * xt * acc[1] % P * R13 % P)
            acc = H.point_add(acc, step)
        for _ in range(w):
            step = H.point_add(step, step)
    return out


def _comb13_kernel(tab_ref, s_ref, ox, oy, oz, racc, *, nwin: int = NWIN):
    """Grid = (batch_tiles, nwin): window j is a sequential grid step, so
    the (64, TSIZE) table block for each window is pipeline-prefetched and
    all in-kernel indexing is static. The running extended point (a=-1
    twist) lives in scratch (4, N, tile) across window steps; madds
    against affine (u, v, k) entries cost 7M + 1M for T.

    nwin < NWIN is a test-only reduced geometry (the comb is LSB-first,
    so it computes (s mod 2^(W*nwin)) * base) letting the default suite
    run the real pallas plumbing with a small XLA-CPU interpret graph."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        for k in range(N):
            racc[0, k, :] = jnp.zeros_like(racc[0, k, :])
            racc[1, k, :] = jnp.full_like(racc[1, k, :], int(ONE_M13[k]))
            racc[2, k, :] = jnp.full_like(racc[2, k, :], int(ONE_M13[k]))
            racc[3, k, :] = jnp.zeros_like(racc[3, k, :])

    limb = s_ref[(j * W) // 16, :]
    digit = (limb >> ((j % 4) * W).astype(_u32)) & _u32(TSIZE - 1)
    slab = tab_ref[0]  # (64, TSIZE), static
    # Per-limb one-hot with SCALAR table extracts: every operand stays a
    # natural (tile,) lane vector — slicing rows of a (64, tile) product
    # instead costs a sublane relayout per limb (~5x whole-kernel hit).
    masks = [(digit == _u32(d)).astype(_u32) for d in range(TSIZE)]
    ent = []
    for c in range(3):
        comp = []
        for k in range(N):
            acc = None
            for d in range(TSIZE):
                v = slab[c * N + k, d] * masks[d]
                acc = v if acc is None else acc + v
            comp.append(acc)
        ent.append(comp)

    r = tuple([racc[c, k, :] for k in range(N)] for c in range(4))
    x3, y3, z3, t3 = emit_addE13(r, (ent[0], ent[1], ent[2], None),
                                 want_t=True)
    for k in range(N):
        racc[0, k, :] = x3[k]
        racc[1, k, :] = y3[k]
        racc[2, k, :] = z3[k]
        racc[3, k, :] = t3[k]

    @pl.when(j == nwin - 1)
    def _emit_out():
        xout = emit_mul_const13(SINV_M13, x3)
        to16 = [jnp.full_like(x3[0], int(v)) for v in TO_R16]
        for ref, limbs in ((ox, xout), (oy, y3), (oz, z3)):
            m16 = emit_cond_sub13(emit_mul13(limbs, to16))
            l16 = emit_repack_13to16(m16)
            for k in range(16):
                ref[k, :] = l16[k]


@functools.partial(jax.jit, static_argnames=("base", "tile", "nwin"))
def fixed_base_fused13(s, base: tuple = tuple(H.B8), tile: int = 0,
                       nwin: int = 0):
    """(16, B) canonical scalars -> mont16 projective scalar*base.

    The whole 64-window comb (one mixed add + one table select per
    window, zero doublings) runs in one kernel; the constant table is
    streamed block-per-window by the grid pipeline. nwin overrides the
    window count (test-only reduced geometry: computes
    (s mod 2^(4*nwin)) * base); production always uses the full NWIN.
    """
    nwin = nwin or NWIN
    tab = jnp.asarray(_comb_table13(base, nbits=W * nwin))
    bsize = s.shape[1]
    tile = tile or _pick_tile(bsize, 4096)
    bs = pl.BlockSpec((16, tile), lambda i, j: (0, i),
                      memory_space=pltpu.VMEM)
    ts = pl.BlockSpec((1, _TROW, TSIZE), lambda i, j: (j, 0, 0),
                      memory_space=pltpu.VMEM)
    sh = jax.ShapeDtypeStruct(s.shape, jnp.uint32)
    kern = (_comb13_kernel if nwin == NWIN
            else functools.partial(_comb13_kernel, nwin=nwin))
    return _pallas_call(
        kern,
        out_shape=(sh, sh, sh),
        grid=(bsize // tile, nwin),
        in_specs=[ts, bs],
        out_specs=(bs, bs, bs),
        scratch_shapes=[pltpu.VMEM((4, N, tile), jnp.uint32)],
    )(tab, s)


# ---------------------------------------------------------------------------
# Fused Poseidon permutation (circomlib-compatible, any t)
# ---------------------------------------------------------------------------

def emit_ark13(s, c_scal):
    """state element + per-round constant (scalars, canonical < p)."""
    return emit_carry13([v + c for v, c in zip(s, c_scal)])


def emit_x5_13(x):
    x2 = emit_sq13(x)
    return emit_mul13(emit_sq13(x2), x)


def emit_mds_row13(mrow, svecs):
    """sum_j mrow[j] * svecs[j], one Montgomery reduction total.

    mrow[j]: 20 scalars (canonical Montgomery MDS entry); svecs[j]: 20
    (tile,) vectors, values < 3p with 13-bit limbs. Products accumulate
    in 2-operand parts: 40 products/column * (2^13-1)^2 = 2.7e9, plus the
    reduction's <= 18 * 2^26 = 1.2e9, stays under 2^32 (9% margin).
    Parts beyond the first are carry-normalized before summing.
    """
    t = len(svecs)
    total = None
    for lo in range(0, t, 2):
        cols = [None] * (2 * N)
        for j in range(lo, min(lo + 2, t)):
            for a in range(N):
                ma = mrow[j][a]
                for b in range(N):
                    k = a + b
                    v = ma * svecs[j][b]
                    cols[k] = v if cols[k] is None else cols[k] + v
        zero = cols[0] * 0
        cols = [zero if c is None else c for c in cols]
        if total is None:
            total = cols
        else:
            cn = _carry_n(cols, 2 * N)
            total = [x + y for x, y in zip(total, cn)]
    return _emit_reduce13(total)


@functools.lru_cache(maxsize=None)
def _poseidon_mxu_w(t: int):
    """int8 weight matrix for the MDS mix as MXU matmuls.

    Limbs and MDS entries split 7+6 bits: s = u + 128*v, M = m0 + 128*m1,
    all pieces in [0, 128) — unsigned int8 with NO offset corrections.
    Two matmuls D0 = W@U, D1 = W@V with W = [W0-plane; W1-plane]
    ((2*t*(2N-1), t*N)); column c of output element i regroups as
      col(i,c) = D0[p0,i,c] + 128*(D0[p1,i,c] + D1[p0,i,c])
                 + 2*D1[p1,i,c-1]<<13   (16384*Q2 pushed up one limb)
    exact in uint32 (< 2^28.5 before the Montgomery reduce).
    """
    from .. import grain
    _, m = grain.poseidon_params(t)
    ncols = 2 * N - 1
    w = np.zeros((2 * t * ncols, t * N), dtype=np.int8)
    for plane in range(2):
        for i in range(t):
            for j in range(t):
                limbs = int_to_limbs13(m[i][j] * R13 % P)
                for a in range(N):
                    e = (limbs[a] >> 7) if plane else (limbs[a] & 0x7F)
                    if not e:
                        continue
                    for b in range(N):
                        w[plane * t * ncols + i * ncols + a + b,
                          j * N + b] = e
    return w


def _poseidon13_kernel(ark_ref, in_ref, o_ref, st, *, t, rf, rp, mds):
    """Grid = (batch_tiles, rf + rp). State (t, N, tile) in scratch; ark
    constants streamed (1, t, N) per round; MDS entries are immediates."""
    j = pl.program_id(1)
    nin = t - 1

    @pl.when(j == 0)
    def _init():
        for k in range(N):
            st[0, k, :] = jnp.zeros_like(st[0, k, :])
        for i in range(nin):
            l13 = emit_shl4_13(emit_repack_16to13(
                [in_ref[k, i, :] for k in range(16)]))
            for k in range(N):
                st[i + 1, k, :] = l13[k]

    arked = []
    for i in range(t):
        c_scal = [ark_ref[0, i, k] for k in range(N)]
        arked.append(emit_ark13([st[i, k, :] for k in range(N)], c_scal))

    mrows = [[[_u32(int(mds[i][jj][a])) for a in range(N)]
              for jj in range(t)] for i in range(t)]

    def mix_and_store(s):
        for i in range(t):
            out = emit_mds_row13(mrows[i], s)
            for k in range(N):
                st[i, k, :] = out[k]

    is_full = jnp.logical_or(j < rf // 2, j >= rf // 2 + rp)

    @pl.when(is_full)
    def _full():
        mix_and_store([emit_x5_13(x) for x in arked])

    @pl.when(jnp.logical_not(is_full))
    def _partial():
        mix_and_store([emit_x5_13(arked[0])] + arked[1:])

    @pl.when(j == rf + rp - 1)
    def _out():
        to16 = [jnp.full_like(st[0, 0, :], int(v)) for v in TO_R16]
        m16 = emit_cond_sub13(emit_mul13([st[0, k, :] for k in range(N)],
                                         to16))
        l16 = emit_repack_13to16(m16)
        for k in range(16):
            o_ref[k, :] = l16[k]


def _poseidon13_mxu_kernel(ark_ref, w_ref, in_ref, o_ref, st, u8, v8, d0, d1,
                           *, t, rf, rp):
    """Poseidon round with the MDS mix on the MXU (see _poseidon_mxu_w).

    Per round: ark + sbox on the VPU, limbs split 7+6 into int8 scratch
    rows, two (2t(2N-1), tN)@(tN, tile) int8 matmuls, regroup + one
    Montgomery reduction per output element. ~2x the all-VPU round."""
    j = pl.program_id(1)
    nin = t - 1
    ncols = 2 * N - 1

    @pl.when(j == 0)
    def _init():
        for k in range(N):
            st[0, k, :] = jnp.zeros_like(st[0, k, :])
        for i in range(nin):
            l13 = emit_shl4_13(emit_repack_16to13(
                [in_ref[k, i, :] for k in range(16)]))
            for k in range(N):
                st[i + 1, k, :] = l13[k]

    arked = []
    for i in range(t):
        c_scal = [ark_ref[0, i, k] for k in range(N)]
        arked.append(emit_ark13([st[i, k, :] for k in range(N)], c_scal))

    is_full = jnp.logical_or(j < rf // 2, j >= rf // 2 + rp)

    def store_uv(s):
        for i in range(t):
            for k in range(N):
                u8[i * N + k, :] = (s[i][k] & 0x7F).astype(jnp.int8)
                v8[i * N + k, :] = (s[i][k] >> 7).astype(jnp.int8)

    @pl.when(is_full)
    def _full():
        store_uv([emit_x5_13(x) for x in arked])

    @pl.when(jnp.logical_not(is_full))
    def _partial():
        store_uv([emit_x5_13(arked[0])] + arked[1:])

    w = w_ref[...]
    dn = (((1,), (0,)), ((), ()))
    d0[...] = jax.lax.dot_general(w, u8[...], dn,
                                  preferred_element_type=jnp.int32)
    d1[...] = jax.lax.dot_general(w, v8[...], dn,
                                  preferred_element_type=jnp.int32)

    for i in range(t):
        cols = [None] * (2 * N)
        for c in range(ncols):
            r0 = i * ncols + c
            r1 = t * ncols + r0
            q0 = d0[r0, :].astype(_u32)
            qm = (d0[r1, :] + d1[r0, :]).astype(_u32)
            q2 = d1[r1, :].astype(_u32)
            v = q0 + (qm << 7)
            cols[c] = v if cols[c] is None else cols[c] + v
            w2 = q2 << 1
            cols[c + 1] = w2 if cols[c + 1] is None else cols[c + 1] + w2
        out = _emit_reduce13(cols)
        for k in range(N):
            st[i, k, :] = out[k]

    @pl.when(j == rf + rp - 1)
    def _out():
        to16 = [jnp.full_like(st[0, 0, :], int(v)) for v in TO_R16]
        m16 = emit_cond_sub13(emit_mul13([st[0, k, :] for k in range(N)],
                                         to16))
        l16 = emit_repack_13to16(m16)
        for k in range(16):
            o_ref[k, :] = l16[k]


@functools.lru_cache(maxsize=None)
def _poseidon13_consts(t: int):
    from .. import grain
    c, m = grain.poseidon_params(t)
    rf = grain.N_ROUNDS_F
    rp = grain.N_ROUNDS_P[t - 2]
    ark = np.zeros((rf + rp, t, N), dtype=np.uint32)
    for r in range(rf + rp):
        for i in range(t):
            ark[r, i] = int_to_limbs13(c[r * t + i] * R13 % P)
    mds = tuple(tuple(int_to_limbs13(m[i][j] * R13 % P) for j in range(t))
                for i in range(t))
    return ark, mds, rf, rp


@functools.partial(jax.jit, static_argnames=("tile", "mode", "rounds"))
def poseidon_fused13(inputs, tile: int = 0, mode: str = "mxu",
                     rounds: tuple | None = None):
    """(16, nin, B) mont16 inputs -> (16, B) mont16 Poseidon hash.

    Whole permutation (rf + rp rounds) in one kernel: rounds ride the
    grid, ark constants stream per round. mode="mxu" (default) runs the
    MDS mix as two unsigned-int8 MXU matmuls (7+6-bit limb/entry split,
    no offset corrections); mode="vpu" uses the all-VPU lazy limb dot.
    rounds=(rf, rp) overrides the round counts (test-only reduced
    geometry against an int model of the same truncated permutation);
    production always uses the Grain-derived full schedule.
    Parity: circomlib Poseidon (reference poseidon-rs dependency,
    /root/reference/src/lib.rs:332-333)."""
    nin, bsize = inputs.shape[1], inputs.shape[2]
    t = nin + 1
    ark, mds, rf, rp = _poseidon13_consts(t)
    if rounds is not None:
        rf, rp = rounds
        ark = ark[:rf + rp]
    ins_map = lambda i, j: (0, 0, i)
    ab_map = lambda i, j: (j, 0, 0)
    ob_map = lambda i, j: (0, i)
    if mode == "mxu":
        tile = tile or _pick_tile(bsize, 2048)  # i32 matmul scratch bound
        w = _poseidon_mxu_w(t)
        kern = functools.partial(_poseidon13_mxu_kernel, t=t, rf=rf, rp=rp)
        return _pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((16, bsize), jnp.uint32),
            grid=(bsize // tile, rf + rp),
            in_specs=[
                pl.BlockSpec((1, t, N), ab_map, memory_space=pltpu.VMEM),
                pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, nin, tile), ins_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((16, tile), ob_map,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((t, N, tile), jnp.uint32),
                pltpu.VMEM((t * N, tile), jnp.int8),
                pltpu.VMEM((t * N, tile), jnp.int8),
                pltpu.VMEM((w.shape[0], tile), jnp.int32),
                pltpu.VMEM((w.shape[0], tile), jnp.int32),
            ],
        )(jnp.asarray(ark), jnp.asarray(w), inputs)
    tile = tile or _pick_tile(bsize, 4096)
    kern = functools.partial(_poseidon13_kernel, t=t, rf=rf, rp=rp, mds=mds)
    return _pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, bsize), jnp.uint32),
        grid=(bsize // tile, rf + rp),
        in_specs=[pl.BlockSpec((1, t, N), ab_map, memory_space=pltpu.VMEM),
                  pl.BlockSpec((16, nin, tile), ins_map,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, tile), ob_map, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t, N, tile), jnp.uint32)],
    )(jnp.asarray(ark), inputs)


# ---------------------------------------------------------------------------
# a = -1 twist: extended-coordinate fast path (ed25519-style formulas)
#
# legendre(-a) = 1, so s = sqrt(-168700) exists and (x, y) -> (s*x, y) is
# an isomorphism onto the a' = -1 curve with d' = -d/a. legendre(d') = -1
# (non-square), so the a=-1 unified extended addition is COMPLETE
# (Hisil-Wong-Carter-Dawson 2008). Doublings cost 3M+4S with no
# curve-constant multiply; additions against (u, v, k, z) table entries
# cost 7M. Twist in/out is one constant multiply per scalar-mul.
#
# Lazy-bound ledger (inputs X,Y,Z,T < 2p):
#   dbl: E < 9.2p, F < 9.05p -> E*F = 83p^2 < 85.3p^2 = p*R13 (the
#   tightest product in the module); all other products < 46p^2.
#   add: u,E2,F2 < 6p; v,H2,G2 < 4p; worst product 36p^2.
# ---------------------------------------------------------------------------

_S_TWIST = H.modsqrt((-H.A_COEFF) % P, P)
_S_TWIST = min(_S_TWIST, P - _S_TWIST)
_D_TW = (-H.D_COEFF * pow(H.A_COEFF, -1, P)) % P       # d' on the -1 curve
S_M13 = int_to_limbs13(_S_TWIST * R13 % P)
SINV_M13 = int_to_limbs13(pow(_S_TWIST, -1, P) * R13 % P)
D2TW_M13 = int_to_limbs13(2 * _D_TW * R13 % P)
P13_2 = int_to_limbs13(2 * P)
P13_8 = int_to_limbs13(8 * P)


def emit_cond_sub_const13(a, c_limbs):
    """One conditional subtract of an arbitrary 20-limb constant."""
    diff = []
    borrow = None
    for k in range(N):
        d = a[k].astype(_i32) - _i32(c_limbs[k])
        if borrow is not None:
            d = d - borrow
        diff.append((d & MASK).astype(_u32))
        borrow = (d >> LB) & 1
    ge = borrow == 0
    return [jnp.where(ge, dk, ak) for dk, ak in zip(diff, a)]


def emit_canon13(a):
    """Reduce a value < 16p to < 2p (three conditional constant subtracts)."""
    a = emit_cond_sub_const13(a, P13_8)
    a = emit_cond_sub_const13(a, P13_4)
    return emit_cond_sub_const13(a, P13_2)


def emit_dblE13(p4, want_t: bool):
    """dbl-2008-hwcd, a = -1: (X, Y, Z, _) -> (X, Y, Z, T?). 3M+4S (+1M)."""
    x1, y1, z1, _ = p4
    a_ = emit_sq13(x1)
    b_ = emit_sq13(y1)
    zz = emit_sq13(z1)
    c_ = emit_add13(zz, zz)
    e_ = emit_sub13(emit_sub13(emit_sq13(emit_add13(x1, y1)), a_), b_)
    g_ = emit_sub13(b_, a_)
    f_ = emit_sub13(g_, c_)
    zero = [jnp.zeros_like(x1[0]) for _ in range(N)]
    h_ = emit_sub13(zero, emit_add13(a_, b_))
    x3 = emit_mul13(e_, f_)
    y3 = emit_mul13(g_, h_)
    z3 = emit_mul13(f_, g_)
    t3 = emit_mul13(e_, h_) if want_t else None
    return (x3, y3, z3, t3)


def emit_addE13(p4, entry, want_t: bool):
    """Unified a=-1 extended add against a table entry (u2, v2, k2, z2),
    u2 = Y2-X2, v2 = Y2+X2, k2 = 2d'*T2. 7M (+1M with T3); complete."""
    x1, y1, z1, t1 = p4
    u2, v2, k2, z2 = entry
    a_ = emit_mul13(emit_sub13(y1, x1), u2)
    b_ = emit_mul13(emit_add13(y1, x1), v2)
    c_ = emit_mul13(t1, k2)
    if z2 is None:  # affine entry (z2 == 1): D2 = 2*Z1, no multiply
        d_ = emit_add13(z1, z1)
    else:
        d_ = emit_mul13(z1, emit_add13(z2, z2))
    e_ = emit_sub13(b_, a_)
    h_ = emit_add13(b_, a_)
    f_ = emit_sub13(d_, c_)
    g_ = emit_add13(d_, c_)
    x3 = emit_mul13(e_, f_)
    y3 = emit_mul13(g_, h_)
    z3 = emit_mul13(f_, g_)
    t3 = emit_mul13(e_, h_) if want_t else None
    return (x3, y3, z3, t3)


def _entry_from_point13(p4):
    """(X, Y, Z, T) -> table entry (u, v, k, z)."""
    x, y, z, t = p4
    return (emit_sub13(y, x), emit_add13(y, x),
            emit_mul_const13(D2TW_M13, t), z)


def _ladder_tw13_kernel(x_ref, y_ref, s_ref, ox, oy, oz, tab):
    """Variable-base ladder on the a=-1 twist. tab: (TSIZE, 4, N, tile)."""
    one = [jnp.full_like(x_ref[0, :], int(v)) for v in ONE_M13]
    zero = [jnp.zeros_like(x_ref[0, :]) for _ in range(N)]

    px = emit_canon13(emit_shl4_13(emit_repack_16to13(
        [x_ref[k, :] for k in range(16)])))
    py = emit_canon13(emit_shl4_13(emit_repack_16to13(
        [y_ref[k, :] for k in range(16)])))
    pxt = emit_mul_const13(S_M13, px)        # twisted x
    t1 = emit_mul13(pxt, py)
    p1 = (pxt, py, one, t1)

    def write_entry(d, ent):
        for c in range(4):
            for k in range(N):
                tab[d, c, k, :] = ent[c][k]

    ident_ent = (one, one, zero, one)        # u=v=1, k=0, z=1 (identity)
    write_entry(0, ident_ent)
    e1 = _entry_from_point13(p1)
    write_entry(1, e1)
    cur = p1
    for d in range(2, TSIZE):
        cur = emit_addE13(cur, e1, want_t=True)
        write_entry(d, _entry_from_point13(cur))

    def read_entry_onehot(digit):
        acc = [[None] * N for _ in range(4)]
        for d in range(TSIZE):
            m = (digit == _u32(d)).astype(_u32)
            for c in range(4):
                for k in range(N):
                    v = m * tab[d, c, k, :]
                    acc[c][k] = v if acc[c][k] is None else acc[c][k] + v
        return tuple(acc)

    def body(j, r):
        rx, ry, rz = r
        for _i in range(3):
            rx, ry, rz, _t = emit_dblE13((rx, ry, rz, None), want_t=False)
        rx, ry, rz, rt = emit_dblE13((rx, ry, rz, None), want_t=True)
        bitpos = (NWIN - 1 - j) * W
        limb = s_ref[bitpos // 16, :]
        digit = (limb >> _u32(bitpos % 16)) & _u32(TSIZE - 1)
        ent = read_entry_onehot(digit)
        x3, y3, z3, _t = emit_addE13((rx, ry, rz, rt), ent, want_t=False)
        return (x3, y3, z3)

    r = jax.lax.fori_loop(0, NWIN, body, (zero, one, one))

    # untwist x, convert to mont16 canonical
    xout = emit_mul_const13(SINV_M13, r[0])
    to16 = [jnp.full_like(x_ref[0, :], int(v)) for v in TO_R16]
    for ref, limbs in ((ox, xout), (oy, r[1]), (oz, r[2])):
        m16 = emit_cond_sub13(emit_mul13(limbs, to16))
        l16 = emit_repack_13to16(m16)
        for k in range(16):
            ref[k, :] = l16[k]


@functools.partial(jax.jit, static_argnames=("tile",))
def scalar_mul_fused_tw13(x, y, s, tile: int = 0):
    """Variable-base scalar mul on the a=-1 twist (drop-in for
    scalar_mul_fused13; ~10% fewer VPU ops)."""
    bsize = x.shape[1]
    tile = tile or _pick_tile(bsize, 1024)  # 4-component table: VMEM-bound
    bs = pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    sh = jax.ShapeDtypeStruct(x.shape, jnp.uint32)
    return _pallas_call(
        _ladder_tw13_kernel,
        out_shape=(sh, sh, sh),
        grid=(bsize // tile,),
        in_specs=[bs, bs, bs],
        out_specs=(bs, bs, bs),
        scratch_shapes=[pltpu.VMEM((TSIZE, 4, N, tile), jnp.uint32)],
    )(x, y, s)


# ---------------------------------------------------------------------------
# Signed-window (Booth) variable-base ladder: 9-entry table
#
# Modified-Booth recoding with w = 4: digit_j = nibble_j + bit(4j-1)
# - 16*bit(4j+3), giving digits in [-8, 8] with the closed-form carry
# (no sequential recode pass): sum_j digit_j*16^j == s exactly when
# bit 255 of s is 0 (the kernel reduces mod ORDER < 2^254 in-register
# before recoding, so any 256-bit input is safe).
#
# Wins over the unsigned kernel (scalar_mul_fused_tw13):
#   * table entries 0..8 (9) instead of 0..15 (16): 7 build adds, not 14;
#   * one-hot table reads scan 9 entries, not 16;
#   * table VMEM (9, 4, 20, tile)*4B halves -> tile 2048 fits the budget
#     (tile size measured as the #1 ladder lever, see ROOFLINE.md).
# Negation at read time is nearly free on the a=-1 twist: -(X, Y, Z, T)
# has entry (u, v, k) -> (v, u, -k) (swap + one lazy negate).
# ---------------------------------------------------------------------------

TSIZE_S = 9  # magnitudes 0..8

ORD16 = tuple((H.ORDER >> (16 * k)) & 0xFFFF for k in range(16))
# floor((2^256 - 1) / ORDER) = 5 (ORDER > 2^253): five conditional
# subtractions reduce any 256-bit scalar mod ORDER.
_ORD_K = ((1 << 256) - 1) // H.ORDER


def _emit_reduce_order16(limbs):
    """16-bit scalar limbs (any s < 2^256) -> s mod ORDER, in-kernel.

    Group-exact for every curve point (all point orders divide
    ORDER = 8*SUBORDER) and guarantees the Booth recode's s < 2^255
    precondition. ~400 vector ops -- noise next to the ladder body;
    replacing the former standalone XLA reduce stage this way bought
    back its ~3.7%% pipeline cost (1.526 -> ~1.58 M scalar-muls/s)."""
    for _ in range(_ORD_K):
        borrow = jnp.zeros_like(limbs[0])
        diff = []
        for k in range(16):
            sub = _u32(ORD16[k]) + borrow
            borrow = (limbs[k] < sub).astype(_u32)
            diff.append((limbs[k] - sub) & _u32(0xFFFF))
        limbs = [jnp.where(borrow == 1, a, d)
                 for a, d in zip(limbs, diff)]
    return limbs


def _ladder_sw13_kernel(x_ref, y_ref, s_ref, ox, oy, oz, tab, sred, *,
                        nwin: int = None, w: int = W):
    """Signed-window ladder on the a=-1 twist, window width ``w``.
    tab: (2^(w-1)+1, 4, N, tile); sred: (17, tile) scratch holding the
    scalar reduced mod ORDER (the window loop indexes limbs dynamically,
    so the reduced scalar lives in a ref, not a traced list; row 16 is a
    zero pad so the generic two-limb digit read never indexes OOB).

    nwin < ceil(256/w) processes only the TOP nwin windows (test-only
    reduced geometry for the kernel-plumbing tests)."""
    nwin_full = -(-256 // w)
    tsize = (1 << (w - 1)) + 1
    if nwin is None:
        nwin = nwin_full
    for k, v in enumerate(_emit_reduce_order16(
            [s_ref[k, :] for k in range(16)])):
        sred[k, :] = v
    sred[16, :] = jnp.zeros_like(s_ref[0, :])
    one = [jnp.full_like(x_ref[0, :], int(v)) for v in ONE_M13]
    zero = [jnp.zeros_like(x_ref[0, :]) for _ in range(N)]

    px = emit_canon13(emit_shl4_13(emit_repack_16to13(
        [x_ref[k, :] for k in range(16)])))
    py = emit_canon13(emit_shl4_13(emit_repack_16to13(
        [y_ref[k, :] for k in range(16)])))
    pxt = emit_mul_const13(S_M13, px)        # twisted x
    t1 = emit_mul13(pxt, py)
    p1 = (pxt, py, one, t1)

    def write_entry(d, ent):
        for c in range(4):
            for k in range(N):
                tab[d, c, k, :] = ent[c][k]

    write_entry(0, (one, one, zero, one))    # identity entry
    e1 = _entry_from_point13(p1)
    write_entry(1, e1)
    cur = p1
    for d in range(2, tsize):
        cur = emit_addE13(cur, e1, want_t=True)
        write_entry(d, _entry_from_point13(cur))

    def read_entry_onehot(mag):
        acc = [[None] * N for _ in range(4)]
        for d in range(tsize):
            m = (mag == _u32(d)).astype(_u32)
            for c in range(4):
                for k in range(N):
                    v = m * tab[d, c, k, :]
                    acc[c][k] = v if acc[c][k] is None else acc[c][k] + v
        return tuple(acc)

    def body(j, r):
        rx, ry, rz = r
        for _i in range(w - 1):
            rx, ry, rz, _t = emit_dblE13((rx, ry, rz, None), want_t=False)
        rx, ry, rz, rt = emit_dblE13((rx, ry, rz, None), want_t=True)
        bitpos = (nwin_full - 1 - j) * w
        # generic two-limb chunk read: a w-bit window can straddle the
        # 16-bit limb boundary (always aligned when w == 4)
        raw = ((sred[bitpos // 16, :] >> _u32(bitpos % 16)) |
               (sred[bitpos // 16 + 1, :]
                << (_u32(16) - _u32(bitpos % 16)))) & _u32((1 << w) - 1)
        hi = raw >> (w - 1)                 # bit(bitpos + w - 1): MSB
        pb = jnp.maximum(bitpos - 1, 0)
        lo = (sred[pb // 16, :] >> _u32(pb % 16)) & _u32(1)
        lo = jnp.where(bitpos > 0, lo, _u32(0))
        d = raw.astype(_i32) + lo.astype(_i32) - (hi.astype(_i32) << w)
        sign = d < 0
        mag = jnp.where(sign, -d, d).astype(_u32)
        u, v, kk, z2 = read_entry_onehot(mag)
        kneg = emit_sub13(zero, kk)          # -k (lazy, < 4p)
        ent = ([jnp.where(sign, b, a) for a, b in zip(u, v)],
               [jnp.where(sign, a, b) for a, b in zip(u, v)],
               [jnp.where(sign, b, a) for a, b in zip(kk, kneg)],
               z2)
        x3, y3, z3, _t = emit_addE13((rx, ry, rz, rt), ent, want_t=False)
        return (x3, y3, z3)

    r = jax.lax.fori_loop(0, nwin, body, (zero, one, one))

    xout = emit_mul_const13(SINV_M13, r[0])
    to16 = [jnp.full_like(x_ref[0, :], int(v)) for v in TO_R16]
    for ref, limbs in ((ox, xout), (oy, r[1]), (oz, r[2])):
        m16 = emit_cond_sub13(emit_mul13(limbs, to16))
        l16 = emit_repack_13to16(m16)
        for k in range(16):
            ref[k, :] = l16[k]


@functools.partial(jax.jit, static_argnames=("tile", "nwin", "w"))
def scalar_mul_fused_sw13(x, y, s, tile: int = 0, nwin: int = None,
                          w: int = W):
    """Variable-base scalar mul, signed-window Booth ladder (production
    route). Accepts ANY 256-bit scalar: the kernel reduces it mod ORDER
    in-register first (group-exact on-curve, and satisfies the Booth
    recode's s < 2^255 precondition), so result == true s*P for every
    curve point and s < 2^256, matching the reference's arbitrary-length
    LSB-first ladder (lib.rs:149-164) on-curve.

    nwin (test-only, default all ceil(256/w) windows): top-windows-only
    reduced geometry for the kernel-plumbing tests.

    w: signed-window width. 4 (production): 64 windows, 9-entry table;
    5 (ablation): 52 windows, 17-entry table. MEASURED (v5e, r5,
    artifacts/ablate_sw_r05.log): w=5 @ tile 1024 = 1.448 M/s vs w=4's
    1.487 M/s despite -19%% point-ops — the 17-entry one-hot table read
    per window costs more than the saved doublings, and tile 2048 fails
    to compile under the larger table's VMEM. w=4 stays production."""
    bsize = x.shape[1]
    # 9-entry table fits tile 2048 (5.9MB) but measures SLOWER than 1024
    # (1.382M vs 1.430M scalar-muls/s on v5e): the freed VMEM does not
    # pay for the reduced pipelining headroom. Measured 2026-08-17.
    tile = tile or _pick_tile(bsize, 1024)
    bs = pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    sh = jax.ShapeDtypeStruct(x.shape, jnp.uint32)
    return _pallas_call(
        functools.partial(_ladder_sw13_kernel, nwin=nwin, w=w),
        out_shape=(sh, sh, sh),
        grid=(bsize // tile,),
        in_specs=[bs, bs, bs],
        out_specs=(bs, bs, bs),
        scratch_shapes=[pltpu.VMEM(((1 << (w - 1)) + 1, 4, N, tile),
                                   jnp.uint32),
                        pltpu.VMEM((17, tile), jnp.uint32)],
    )(x, y, s)


# ---------------------------------------------------------------------------
# Fused Fermat inversion: a^(p-2) in one kernel
# ---------------------------------------------------------------------------

def emit_pow_const13(a, e: int, w: int = 4):
    """a^e for a COMPILE-TIME exponent: 4-bit windowing with no table
    selects (each window multiplies by the statically-known power)."""
    nwin = (e.bit_length() + w - 1) // w
    digits = [(e >> (w * i)) & (2 ** w - 1) for i in range(nwin)]
    pows = {1: a, 2: emit_sq13(a)}
    for d in range(3, 1 << w):
        pows[d] = emit_mul13(pows[d - 1], a)
    acc = None
    for i in range(nwin - 1, -1, -1):
        if acc is not None:
            for _ in range(w):
                acc = emit_sq13(acc)
        d = digits[i]
        if d:
            acc = pows[d] if acc is None else emit_mul13(acc, pows[d])
    return acc


def emit_inv13(a, e: int = P - 2):
    """Batched modular inverse via Fermat (inv(0) == 0, matching the
    16-bit path's convention used by to_affine, reference lib.rs:70-76).
    ~252 squarings + ~75 multiplies, all VMEM-resident.
    Input < ~3p lazy; output < 2p (0 maps to 0).

    e (test-only): a small exponent shrinks the statically-unrolled chain
    so the default-suite plumbing test can compile this exact kernel on
    XLA-CPU; Montgomery exponentiation is domain-stable for any e."""
    return emit_pow_const13(a, e)


# Tonelli-Shanks constants (2-adicity m = 28 for BN254-Fr)
_TS_M = 28
_TS_QODD = (P - 1) >> _TS_M
_z = 2
while pow(_z, (P - 1) >> 1, P) != P - 1:
    _z += 1
TS_G13 = int_to_limbs13(pow(_z, _TS_QODD, P) * R13 % P)


def emit_sqrt13(a, ts_m: int = _TS_M, ts_qodd: int = _TS_QODD,
                ts_g13: tuple = TS_G13):
    """Masked fixed-bound Tonelli-Shanks square root, mont13 domain.

    Same structure as Fp.sqrt (ops/field.py) / reference utils.rs:109-160
    with the data-dependent loop bounded statically by the 2-adicity (28).
    Input a: lazy < 4p; returns (root < 2p, is_qr bool). ~230 + 378
    squarings + ~90 multiplies.

    (ts_m, ts_qodd, ts_g13) are test-only overrides: tiny parameters make
    the statically-unrolled chain compile on XLA-CPU in seconds, running
    the SAME algorithm (compared against an int model in the default
    suite); the defaults compute the real field sqrt.
    """
    one = [jnp.full_like(a[0], int(v)) for v in ONE_M13]
    w = emit_pow_const13(a, (ts_qodd - 1) // 2) if ts_qodd > 1 else \
        [jnp.full_like(a[0], int(v)) for v in ONE_M13]
    r = emit_mul13(w, a)
    t = emit_mul13(r, w)
    c = [jnp.full_like(a[0], int(v)) for v in ts_g13]

    def canon(x):
        return emit_cond_sub13(x)

    def eq_one(x):
        xc = canon(x)
        m = None
        for k in range(N):
            e = xc[k] == one[k]
            m = e if m is None else (m & e)
        return m

    for i in range(ts_m - 2, -1, -1):
        d = t
        for _ in range(i):
            d = emit_sq13(d)
        flip = ~eq_one(d)
        rc = emit_mul13(r, c)
        r = [jnp.where(flip, x, y) for x, y in zip(rc, r)]
        c = emit_sq13(c)
        tc = emit_mul13(t, c)
        t = [jnp.where(flip, x, y) for x, y in zip(tc, t)]
    r2 = canon(emit_sq13(r))
    ac = canon(canon(a))  # a < 4p -> two conditional subtracts -> < p
    is_qr = None
    for k in range(N):
        e = r2[k] == ac[k]
        is_qr = e if is_qr is None else (is_qr & e)
    return r, is_qr


def _inv13_kernel(x_ref, o_ref, *, e: int = P - 2):
    """(16, tile) mont16 -> (16, tile) mont16 canonical inverse.

    Montgomery exponentiation is domain-stable (each mont-mul folds one
    R^-1), so the windowed chain on mont13(x) yields mont13(x^(p-2)) =
    mont13(1/x) directly; convert back with the plain 2^256 multiply.
    """
    x13 = emit_shl4_13(emit_repack_16to13([x_ref[k, :] for k in range(16)]))
    r = emit_inv13(x13, e)
    to16 = [jnp.full_like(x13[0], int(v)) for v in TO_R16]
    l16 = emit_repack_13to16(emit_cond_sub13(emit_mul13(r, to16)))
    for k in range(16):
        o_ref[k, :] = l16[k]


def _sqrt13_kernel(x_ref, o_ref, q_ref, *, ts=None):
    x13 = emit_shl4_13(emit_repack_16to13([x_ref[k, :] for k in range(16)]))
    x13 = emit_canon13(x13)          # < 2p for the T-S exponent chain
    if ts is None:
        r, is_qr = emit_sqrt13(x13)
    else:
        r, is_qr = emit_sqrt13(x13, *ts)
    to16 = [jnp.full_like(x13[0], int(v)) for v in TO_R16]
    l16 = emit_repack_13to16(emit_cond_sub13(emit_mul13(r, to16)))
    for k in range(16):
        o_ref[k, :] = l16[k]
    q_ref[0, :] = is_qr.astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("tile", "ts"))
def sqrt_fused13(x, tile: int = 0, ts: tuple = None):
    """Batched Tonelli-Shanks sqrt, (16, B) mont16 -> (root, is_qr).

    ts (test-only): (m, qodd, g13_limbs) override for a tiny reduced
    chain — see emit_sqrt13."""
    tile = tile or _pick_tile(x.shape[1], 4096)
    bs = pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    qs = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    root, qr = _pallas_call(
        functools.partial(_sqrt13_kernel, ts=ts),
        out_shape=(jax.ShapeDtypeStruct(x.shape, jnp.uint32),
                   jax.ShapeDtypeStruct((1, x.shape[1]), jnp.uint32)),
        grid=(x.shape[1] // tile,),
        in_specs=[bs],
        out_specs=(bs, qs),
    )(x)
    return root, qr[0].astype(bool)


@functools.partial(jax.jit, static_argnames=("tile", "e"))
def inv_fused13(x, tile: int = 0, e: int = P - 2):
    """Batched field inverse, (16, B) mont16 -> (16, B) mont16.

    e (test-only): small exponent for the default-suite plumbing test —
    see emit_inv13."""
    tile = tile or _pick_tile(x.shape[1], 4096)
    bs = pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    return _pallas_call(
        functools.partial(_inv13_kernel, e=e),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        grid=(x.shape[1] // tile,),
        in_specs=[bs],
        out_specs=bs,
    )(x)


# ---------------------------------------------------------------------------
# Standalone mulmod kernel (microbench / tests)
# ---------------------------------------------------------------------------

def _mulmod13_kernel(a_ref, b_ref, o_ref, *, square):
    a = [a_ref[k, :] for k in range(N)]
    b = a if square else [b_ref[k, :] for k in range(N)]
    r = emit_sq13(a) if square else emit_mul13(a, b)
    r = emit_cond_sub13(r)
    for k in range(N):
        o_ref[k, :] = r[k]


@functools.partial(jax.jit, static_argnames=("tile", "square"))
def mulmod13(a, b, tile: int = 512, square: bool = False):
    """(20, B) canonical 13-bit mont13 limbs -> canonical product."""
    bs = pl.BlockSpec((N, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    return _pallas_call(
        functools.partial(_mulmod13_kernel, square=square),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        grid=(a.shape[1] // tile,),
        in_specs=[bs, bs],
        out_specs=bs,
    )(a, b)


# host codecs for tests/bench ------------------------------------------------

def ints_to_array13(xs) -> np.ndarray:
    return np.stack(
        [np.array(int_to_limbs13(x), dtype=np.uint32) for x in xs], axis=-1)


def array13_to_ints(arr) -> list:
    arr = np.asarray(arr, dtype=np.uint64).reshape(N, -1)
    return [sum(int(arr[k, i]) << (LB * k) for k in range(N))
            for i in range(arr.shape[1])]
