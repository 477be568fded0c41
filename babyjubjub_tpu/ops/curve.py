"""Batched twisted-Edwards group ops for BabyJubJub on TPU.

Representation: a batch of projective points is a tuple ``(X, Y, Z)`` of
uint32 ``(16, *batch)`` limb arrays in Montgomery domain over FQ. Affine
batches are ``(X, Y)``. The identity is (0, 1, 1) / (0, 1).

All ops are branch-free and batched-first:
  * ``add``     — unified add-2008-bbjlp (10M + 1S), the same formula the
                  reference uses (/root/reference/src/lib.rs:88-131), so it
                  handles doubling and the identity without branches.
  * ``double``  — dedicated dbl-2008-bbjlp (4M + 4S); projective outputs
                  differ from ``add(p, p)`` but affine results are equal,
                  and the framework only exposes affine results.
  * ``scalar_mul`` — 256-step constant-time LSB-first double-and-add ladder
                  (reference lib.rs:149-164, with the data-dependent branch
                  replaced by a lane select). Scalars must be < 2^256;
                  callers reduce mod ORDER first (group-exact: every curve
                  point has order dividing ORDER).
  * ``fixed_base_mul`` — 4-bit comb over precomputed multiples of a fixed
                  base (64 window adds, no doublings); used for B8 in
                  keygen/sign/verify (reference hot loops lib.rs:305,329,405).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from ..utils import hostmath as H

fq = F.fq()

_u32 = jnp.uint32

# Montgomery-domain curve coefficients
_A_M = F.int_to_limbs(F.FQ_SPEC.to_mont_int(H.A_COEFF))
_D_M = F.int_to_limbs(F.FQ_SPEC.to_mont_int(H.D_COEFF))


def _const(c: np.ndarray, ndim: int) -> jnp.ndarray:
    return jnp.asarray(c, dtype=_u32).reshape((F.NLIMB,) + (1,) * (ndim - 1))


# ---------------------------------------------------------------------------
# Host <-> device point codecs
# ---------------------------------------------------------------------------

def points_to_arrays(pts, mont: bool = True):
    """[(x, y), ...] python-int affine points -> (X, Y) limb arrays.

    mont=False emits canonical limbs (device converts; avoids the O(B)
    host bigint Montgomery pass); out-of-range coords are still reduced
    mod Q host-side so semantics match the mont=True path for any int.
    """
    if mont:
        enc = F.FQ_SPEC.to_mont_int
    else:
        q = F.FQ_SPEC.p
        enc = (lambda v: v if 0 <= v < q else v % q)
    xs = F.ints_to_array([enc(p[0]) for p in pts])
    ys = F.ints_to_array([enc(p[1]) for p in pts])
    return xs, ys


def arrays_to_points(xy, mont: bool = True):
    xs, ys = xy
    dec = (F.FQ_SPEC.from_mont_int if mont else (lambda v: v))
    xi = [dec(v) for v in F.array_to_ints(xs)]
    yi = [dec(v) for v in F.array_to_ints(ys)]
    return list(zip(xi, yi))


def identity(batch_shape):
    """Projective identity (0, 1, 1) in Montgomery domain."""
    zero = fq.zeros(batch_shape)
    one = fq.one_mont(batch_shape)
    return (zero, one, one)


def to_projective(aff):
    x, y = aff
    return (x, y, fq.one_mont(x.shape[1:]))


# ---------------------------------------------------------------------------
# Group ops
# ---------------------------------------------------------------------------

def _pallas_point_shape(p):
    """Flat (16, B) batch eligible for the fused pallas point kernels?"""
    x = p[0]
    if x.ndim != 2 or x.shape[1] % F._PALLAS_TILE != 0:
        return False
    return F._pallas_enabled()


def add(p, q):
    """Unified projective addition, add-2008-bbjlp (reference lib.rs:88-131).

    On TPU, flat batches route through the fused Pallas kernel (all 11
    field muls in one kernel, intermediates stay in VMEM).
    """
    if _pallas_point_shape(p) and p[0].shape == q[0].shape:
        from .pallas import point as PK
        return PK.point_add(p[0], p[1], p[2], q[0], q[1], q[2])
    x1, y1, z1 = p
    x2, y2, z2 = q
    a = fq.mul(z1, z2)
    b = fq.sq(a)
    c = fq.mul(x1, x2)
    d = fq.mul(y1, y2)
    dmont = _const(_D_M, x1.ndim)
    e = fq.mul(fq.mul(dmont + jnp.zeros_like(x1), c), d)
    f = fq.sub(b, e)
    g = fq.add(b, e)
    x1y1 = fq.add(x1, y1)
    x2y2 = fq.add(x2, y2)
    aux = fq.sub(fq.sub(fq.mul(x1y1, x2y2), c), d)
    x3 = fq.mul(fq.mul(a, f), aux)
    amont = _const(_A_M, x1.ndim)
    ac = fq.mul(amont + jnp.zeros_like(x1), c)
    dac = fq.sub(d, ac)
    y3 = fq.mul(fq.mul(a, g), dac)
    z3 = fq.mul(f, g)
    return (x3, y3, z3)


def double(p):
    """Dedicated doubling, dbl-2008-bbjlp (4M + 4S + const-mul)."""
    if _pallas_point_shape(p):
        from .pallas import point as PK
        return PK.point_double(p[0], p[1], p[2])
    x1, y1, z1 = p
    b = fq.sq(fq.add(x1, y1))
    c = fq.sq(x1)
    d = fq.sq(y1)
    amont = _const(_A_M, x1.ndim)
    e = fq.mul(amont + jnp.zeros_like(x1), c)
    f = fq.add(e, d)
    h = fq.sq(z1)
    j = fq.sub(f, fq.add(h, h))
    x3 = fq.mul(fq.sub(fq.sub(b, c), d), j)
    y3 = fq.mul(f, fq.sub(e, d))
    z3 = fq.mul(f, j)
    return (x3, y3, z3)


def select(cond, p, q):
    """Per-lane point select: where(cond, p, q)."""
    return tuple(jnp.where(cond[None], a, b) for a, b in zip(p, q))


def to_affine(p):
    """Projective -> affine via Fermat inversion; (0,0) when z == 0.

    The z == 0 convention matches the reference (lib.rs:70-76); z == 0 never
    occurs for valid curve points but the behavior is preserved.
    """
    x, y, z = p
    zero = fq.is_zero(z)
    zinv = fq.inv(z)  # inv(0) == 0, so x*0, y*0 gives (0, 0) for free
    return (fq.mul(x, zinv), fq.mul(y, zinv))


def _scalar_bit(scalars, i):
    """Bit i of (16, *batch) u32 16-bit-limb scalars (LSB-first)."""
    limb = jax.lax.dynamic_index_in_dim(scalars, i >> 4, axis=0, keepdims=False)
    return (limb >> (i & 15)) & 1


def scalar_mul(aff, scalars, nbits: int = 256):
    """Variable-base scalar mul: batch points x batch scalars -> affine.

    aff: (X, Y) Montgomery affine batch; scalars: (16, *batch) canonical
    16-bit-limb integers < 2^nbits. Constant-time double-and-add.
    """
    r0 = identity(aff[0].shape[1:])
    e0 = to_projective(aff)

    def body(i, carry):
        r, e = carry
        bit = _scalar_bit(scalars, i)
        r = select(bit == 1, add(r, e), r)
        e = double(e)
        return (r, e)

    r, _ = jax.lax.fori_loop(0, nbits, body, (r0, e0))
    return to_affine(r)


def affine_eq_proj(p, s):
    """Affine equality of two projective batches without inversions.

    Matches reference semantics where affine() of z == 0 is (0, 0)
    (lib.rs:70-76) and equality is plain coordinate equality (lib.rs:180).
    """
    lx, ly, lz = p
    sx, sy, sz = s
    lz0 = fq.is_zero(lz)
    sz0 = fq.is_zero(sz)
    cross = fq.eq(fq.mul(lx, sz), fq.mul(sx, lz)) & \
        fq.eq(fq.mul(ly, sz), fq.mul(sy, lz))
    one_zero = lz0 ^ sz0
    alt = jnp.where(lz0, fq.is_zero(sx) & fq.is_zero(sy),
                    fq.is_zero(lx) & fq.is_zero(ly))
    return jnp.where(one_zero, alt, cross)


def _resolve_w(w):
    """Window bits: explicit argument, else CONFIG.window (BJJ_WINDOW).
    Must divide 16 so a window digit never straddles a 16-bit limb."""
    if w is None:
        from ..utils.config import CONFIG
        w = CONFIG.window
    assert w in (1, 2, 4, 8), f"window bits must be in (1, 2, 4, 8): {w}"
    return w


def scalar_mul_windowed(aff, scalars, nbits: int = 256, w: int | None = None):
    """Variable-base scalar mul with a w-bit window (MSB-first).

    Precomputes [0..2^w-1]P per lane (2^w - 2 adds + identity), then per
    window: w doublings + one table-select + one add. ~1.6x fewer field
    muls than the plain ladder at w=4. Default w comes from the config
    (BJJ_WINDOW); only w=4 is eligible for the fused kernel route.

    On TPU, flat tile-aligned batches route through the fused 13-bit-limb
    mega-ladder on the a=-1 twist (pallas/fast13.py): the whole 256-bit
    ladder runs in one kernel on a lazy-carry field core with
    extended-coordinate formulas (3M+4S doublings, 7M window adds) and
    signed-window Booth digits (9-entry table). The signed recode needs
    scalars < 2^255, so the kernel reduces the scalar mod ORDER
    in-register first (five conditional subtractions — ORDER > 2^253;
    measured ~3.7% cheaper than the former standalone XLA reduce stage).
    Reduction mod ORDER is group-exact for every curve point (all point
    orders divide ORDER = 8*SUBORDER), so the fused route matches the
    jnp fallback's true s*P for ANY s < 2^256 on-curve; callers never
    pre-reduce.
    """
    w = _resolve_w(w)
    x = aff[0]
    if (w == 4 and nbits == 256 and x.ndim == 2 and scalars.shape == x.shape
            and x.shape[1] % F._PALLAS_TILE == 0 and F._pallas_enabled()):
        from .pallas import fast13 as FK13
        return FK13.scalar_mul_fused_sw13(x, aff[1], scalars)
    assert nbits % w == 0
    nwin = nbits // w
    tsize = 1 << w
    bsh = aff[0].shape[1:]

    # per-lane table: entry d = d*P (projective), built by a scan of adds
    p1 = to_projective(aff)

    def tab_body(prev, _):
        nxt = add(prev, p1)
        return nxt, nxt

    _, tail = jax.lax.scan(tab_body, p1, None, length=tsize - 2)
    ident = identity(bsh)
    # stack: (tsize, 16, *batch) per coordinate
    table = tuple(
        jnp.concatenate([jnp.stack([ident[c], p1[c]]), tail[c]], axis=0)
        for c in range(3))

    def window_digit(i):
        """Digit of window i (MSB-first over nwin windows)."""
        win = nwin - 1 - i
        bitpos = win * w
        limb = jax.lax.dynamic_index_in_dim(scalars, bitpos >> 4, axis=0,
                                            keepdims=False)
        return (limb >> (bitpos & 15)) & (tsize - 1)  # w<=4 keeps window in one 16-bit limb

    def lookup(digit):
        """Per-lane table entry via one-hot select (branch-free gather)."""
        oh = (digit[None] == jnp.arange(tsize, dtype=_u32)
              .reshape((tsize,) + (1,) * digit.ndim)).astype(_u32)
        out = []
        for c in range(3):
            # sum_d onehot[d] * table[d]  (exact: u32 * {0,1})
            out.append(jnp.sum(oh[:, None] * table[c], axis=0))
        return tuple(out)

    def body(i, r):
        for _ in range(w):
            r = double(r)
        t = lookup(window_digit(i))
        return add(r, t)

    r0 = identity(bsh)
    # first window without the leading doublings of identity is fine too,
    # but keep it uniform for simplicity
    return jax.lax.fori_loop(0, nwin, body, r0)


def scalar_mul_windowed_affine(aff, scalars, nbits: int = 256,
                               w: int | None = None):
    return to_affine(scalar_mul_windowed(aff, scalars, nbits, w))


# ---------------------------------------------------------------------------
# Fixed-base comb (for B8)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _comb_table(base: tuple, w: int = 4, nbits: int = 256) -> np.ndarray:
    """Host-precomputed comb table: table[j, d] = d * 2^(w*j) * base (affine).

    Returned as uint32 (nwin, 2^w, 2, 16) Montgomery-affine limbs.
    """
    nwin = nbits // w
    tsize = 1 << w
    out = np.zeros((nwin, tsize, 2, F.NLIMB), dtype=np.uint32)
    step = base
    for j in range(nwin):
        acc = H.IDENTITY
        for d in range(tsize):
            out[j, d, 0] = F.int_to_limbs(F.FQ_SPEC.to_mont_int(acc[0]))
            out[j, d, 1] = F.int_to_limbs(F.FQ_SPEC.to_mont_int(acc[1]))
            acc = H.point_add(acc, step)
        # step for next window: 2^w * previous step
        for _ in range(w):
            step = H.point_add(step, step)
    return out


def fixed_base_mul(scalars, base=H.B8, w: int | None = None, nbits: int = 256,
                   win_offset=0, nwin_local: int | None = None):
    """scalar * base for a fixed base point: 64 table-selected adds, no doubles.

    scalars: (16, *batch) canonical limbs < 2^256 (reduce mod ORDER first).
    `win_offset`/`nwin_local` select a contiguous window subset so comb
    windows can shard across a mesh axis (partial sums combined by the
    caller with point adds — the comb is a plain group sum over windows).

    On TPU, flat tile-aligned full-width calls route through the fused
    13-bit-limb comb kernel (pallas/fast13.py).
    """
    w = _resolve_w(w)
    if (w == 4 and nbits == 256 and type(win_offset) is int
            and win_offset == 0 and nwin_local is None
            and scalars.ndim == 2 and scalars.shape[1] % F._PALLAS_TILE == 0
            and F._pallas_enabled()):
        from .pallas import fast13 as FK13
        return FK13.fixed_base_fused13(scalars, tuple(base))
    table = jnp.asarray(_comb_table(tuple(base), w, nbits))  # (nwin,tsize,2,16)
    nwin = nwin_local if nwin_local is not None else nbits // w
    tsize = 1 << w
    bsh = scalars.shape[1:]
    one = fq.one_mont(bsh)

    def body(j, r):
        bitpos = (j + win_offset) * w
        limb = jax.lax.dynamic_index_in_dim(scalars, bitpos >> 4, axis=0,
                                            keepdims=False)
        digit = (limb >> (bitpos % 16)) & (tsize - 1)
        ttab = jax.lax.dynamic_index_in_dim(table, j + win_offset, axis=0,
                                            keepdims=False)  # (tsize,2,16)
        oh = (digit[None] == jnp.arange(tsize, dtype=_u32)
              .reshape((tsize,) + (1,) * digit.ndim)).astype(_u32)
        # one-hot contraction: (tsize, *b) x (tsize, 2, 16) -> (2, 16, *b)
        sel = jnp.tensordot(ttab.astype(_u32), oh, axes=((0,), (0,)))  # (2,16,*b)
        tx, ty = sel[0], sel[1]
        return add(r, (tx, ty, one))

    return jax.lax.fori_loop(0, nwin, body, identity(bsh))


def fixed_base_mul_affine(scalars, base=H.B8, w: int | None = None,
                          nbits: int = 256):
    return to_affine(fixed_base_mul(scalars, base, w, nbits))


# ---------------------------------------------------------------------------
# Equality / membership (affine Montgomery batches)
# ---------------------------------------------------------------------------

def points_equal(p, q):
    return fq.eq(p[0], q[0]) & fq.eq(p[1], q[1])


def on_curve(x_m, y_m):
    """Batched curve membership: a*x^2 + y^2 == 1 + d*x^2*y^2 (Montgomery).

    Device analog of the host oracle hostmath.is_on_curve. The reference
    has no such check (lib.rs:395-412 runs the raw add formulas on any
    (x, y) pair); this framework's documented divergence rejects off-curve
    verify inputs, and at 4 field muls per lane — noise next to a ladder —
    the validation runs on device instead of as a per-lane host bigint
    check.
    """
    x2 = fq.sq(x_m)
    y2 = fq.sq(y_m)
    amont = _const(_A_M, x_m.ndim) + jnp.zeros_like(x_m)
    dmont = _const(_D_M, x_m.ndim) + jnp.zeros_like(x_m)
    lhs = fq.add(fq.mul(amont, x2), y2)
    rhs = fq.add(fq.one_mont(x_m.shape[1:]), fq.mul(fq.mul(dmont, x2), y2))
    return fq.eq(lhs, rhs)
