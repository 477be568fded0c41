"""Pallas TPU kernel: batched 254-bit Montgomery multiplication.

The single most important kernel (SURVEY.md section 7: ~95% of cycles).
Straight-line unrolled limb arithmetic inside the kernel: Mosaic compiles
the flat vector code directly, sidestepping both XLA scan overhead (50x
at these shapes) and XLA's pathological constant-folding of unrolled HLO.

Layout: operands are (16, B) uint32 16-bit-limb arrays; the kernel tiles
B into lanes (TILE = 512 default) with the limb axis on sublanes — a
(16, 512) u32 block is 16 native (8, 128) vreg tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import field as F

NLIMB = F.NLIMB
MASK = F.MASK
LB = F.LIMB_BITS


def _pallas_call(*args, **kwargs):
    """pallas_call with the module INTERPRET switch (see fast13.py)."""
    from . import fast13
    return pl.pallas_call(*args, interpret=fast13.INTERPRET, **kwargs)


def emit_prod_columns(a, b):
    """Unrolled schoolbook product columns: a, b lists of 16 (TILE,) u32
    vectors -> 32 column vectors (< 2^21)."""
    t = [None] * (2 * NLIMB)
    for i in range(NLIMB):
        for j in range(NLIMB):
            p = a[i] * b[j]
            lo = p & MASK
            hi = p >> LB
            t[i + j] = lo if t[i + j] is None else t[i + j] + lo
            k = i + j + 1
            t[k] = hi if t[k] is None else t[k] + hi
    return t


def emit_sq_columns(a):
    """Squaring product columns: off-diagonal products accumulated once,
    doubled in one pass at the end (136 multiplies instead of 256).
    Column bound: diag < 2^21 plus 2x off-diag sums < 2^22 — safe."""
    t = [None] * (2 * NLIMB)   # diagonal terms
    u = [None] * (2 * NLIMB)   # off-diagonal (to be doubled)

    def acc(dst, k, v):
        dst[k] = v if dst[k] is None else dst[k] + v

    for i in range(NLIMB):
        p = a[i] * a[i]
        acc(t, 2 * i, p & MASK)
        acc(t, 2 * i + 1, p >> LB)
        for j in range(i + 1, NLIMB):
            p = a[i] * a[j]
            acc(u, i + j, p & MASK)
            acc(u, i + j + 1, p >> LB)
    out = []
    for k in range(2 * NLIMB):
        if t[k] is None and u[k] is None:
            out.append(None)
        elif u[k] is None:
            out.append(t[k])
        elif t[k] is None:
            out.append(u[k] * 2)
        else:
            out.append(t[k] + u[k] * 2)
    # replace leading/trailing Nones with zeros-like for safety
    z = None
    for v in out:
        if v is not None:
            z = v * 0
            break
    return [z if v is None else v for v in out]


def emit_mont_reduce(t, q_limbs, ninv, n_sub: int = 1):
    """Unrolled word-level Montgomery reduction of 32 columns -> 16 canonical
    limbs (list of vectors)."""
    t = list(t)
    ninv = jnp.uint32(ninv)
    for i in range(NLIMB):
        t[i + 1] = t[i + 1] + (t[i] >> LB)
        ti = t[i] & MASK
        m = (ti * ninv) & MASK
        for j in range(NLIMB):
            p = m * jnp.uint32(int(q_limbs[j]))
            if j == 0:
                t[i] = ti + (p & MASK)
            else:
                t[i + j] = t[i + j] + (p & MASK)
            t[i + j + 1] = t[i + j + 1] + (p >> LB)
        t[i + 1] = t[i + 1] + (t[i] >> LB)
    res = emit_carry(t[NLIMB:2 * NLIMB])
    for _ in range(n_sub):
        res = emit_cond_sub(res, q_limbs)
    return res


# ---------------------------------------------------------------------------
# MXU-offloaded Montgomery reduction
#
# Word-serial Montgomery reduction costs ~1400 VPU ops; in "separated" form
# it is two multiplications BY CONSTANTS (m = T_lo * N' mod R; T + m*q),
# and constant-times-bigint is a banded-matrix product over the limb axis —
# an MXU matmul. int8 operands don't fit unsigned bytes, so both sides are
# offset by -128 and corrected exactly:
#   sum_i M[k,i]*x[i] = dot(M-128, x-128)[k] + 128*S + C_k
# with S = sum_i x[i] (shared) and C_k = 128*rowsum(M)_k - 128^2*n host-side.
# ---------------------------------------------------------------------------

import numpy as np


def _band_i8(c: int, n_in: int, n_out: int):
    """Byte band matrix for y = c * x (x: n_in bytes, y: n_out byte-columns).

    Returns (M_i8 (n_out, n_in) int8 holding byte-128, consts (n_out,) int32)
    such that true_col_k = dot(M_i8, x-128)[k] + 128*S + consts[k].
    """
    m = np.zeros((n_out, n_in), dtype=np.int64)
    for k in range(n_out):
        for i in range(n_in):
            sh = k - i
            if sh >= 0:
                m[k, i] = (c >> (8 * sh)) & 0xFF
    consts = (128 * m.sum(axis=1) - 128 * 128 * n_in).astype(np.int32)
    return (m - 128).astype(np.int8), consts


def emit_to_bytes_offset(limbs16):
    """16-bit limb vectors -> ((2n, TILE) int8 of bytes-128, S = byte sum)."""
    rows = []
    s = None
    for v in limbs16:
        lo = (v & 0xFF).astype(jnp.int32)
        hi = ((v >> 8) & 0xFF).astype(jnp.int32)
        s = lo + hi if s is None else s + lo + hi
        rows.append((lo - 128).astype(jnp.int8))
        rows.append((hi - 128).astype(jnp.int8))
    return jnp.stack(rows), s


def emit_band_mul(m_i8, consts: np.ndarray, x_i8, s):
    """int8 banded matmul -> list of exact int32 byte-stride columns.

    m_i8: (n_out, n_in) int8 array value (kernel input); consts: host ints.
    """
    dot = jax.lax.dot_general(
        m_i8, x_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)          # (n_out, TILE)
    s128 = s * 128
    cols = []
    for k in range(m_i8.shape[0]):
        cols.append(dot[k] + s128 + jnp.int32(int(consts[k])))
    return cols


def _regroup16(cols, n_out16):
    """Byte-stride int32 columns -> 16-bit-stride u32 columns (no carries)."""
    out = []
    for t in range(n_out16):
        v = cols[2 * t]
        if 2 * t + 1 < len(cols):
            v = v + (cols[2 * t + 1] << 8)
        out.append(v.astype(jnp.uint32))
    return out


@functools.lru_cache(maxsize=None)
def _mxu_consts(q_limbs: tuple):
    q = sum(int(v) << (16 * i) for i, v in enumerate(q_limbs))
    r = 1 << 256
    nprime = (-pow(q, -1, r)) % r
    m_np, c_np = _band_i8(nprime, 32, 32)   # m = T_lo * N' mod 2^256
    m_q, c_q = _band_i8(q, 32, 64)          # full m * q
    return (m_np, c_np, m_q, c_q)


def emit_mont_reduce_mxu(t, q_limbs, band_np, band_q, n_sub: int = 1):
    """Montgomery reduction of 32 product columns via two int8 MXU matmuls.

    band_np / band_q: in-kernel int8 array values of the N' and q bands
    (passed as pallas inputs; constants live in _mxu_consts)."""
    _, c_np, _, c_q = _mxu_consts(tuple(int(v) for v in q_limbs))

    t16 = emit_carry_n(t, 2 * NLIMB)             # canonical 16-bit, 32 limbs
    tlo8, s_lo = emit_to_bytes_offset(t16[:NLIMB])
    mcols = emit_band_mul(band_np, c_np, tlo8, s_lo)
    m16 = _regroup16(mcols, NLIMB)
    m16 = emit_carry_n(m16, NLIMB)               # mod 2^256: drop final carry
    m8, s_m = emit_to_bytes_offset(m16)
    mqcols = emit_band_mul(band_q, c_q, m8, s_m)
    mq16 = _regroup16(mqcols, 2 * NLIMB)

    total = [t16[k] + mq16[k] for k in range(2 * NLIMB)]
    # divide by 2^256: low half is ≡ 0; ripple its carry into the high half
    c = None
    for k in range(NLIMB):
        v = total[k] if c is None else total[k] + c
        c = v >> LB
    res = list(total[NLIMB:])
    res[0] = res[0] + c
    res = emit_carry(res)
    for _ in range(n_sub):
        res = emit_cond_sub(res, q_limbs)
    return res


def emit_carry_n(cols, n):
    """Carry-normalize n columns to 16-bit limbs (drops the final carry)."""
    out = []
    c = None
    for k in range(n):
        v = cols[k] if c is None else cols[k] + c
        out.append(v & MASK)
        c = v >> LB
    return out


def emit_carry(cols):
    out = []
    c = None
    for k in range(NLIMB):
        v = cols[k] if c is None else cols[k] + c
        out.append(v & MASK)
        c = v >> LB
    return out


def emit_cond_sub(limbs, q_limbs):
    """Value < 2p -> canonical. limbs: 16 u32 vectors."""
    diff = []
    borrow = None
    for k in range(NLIMB):
        d = limbs[k].astype(jnp.int32) - jnp.int32(int(q_limbs[k]))
        if borrow is not None:
            d = d - borrow
        diff.append((d & MASK).astype(jnp.uint32))
        borrow = (d < 0).astype(jnp.int32)
    ge = borrow == 0
    return [jnp.where(ge, dk, lk) for dk, lk in zip(diff, limbs)]


def emit_mulmod(a, b, q_limbs, ninv):
    return emit_mont_reduce(emit_prod_columns(a, b), q_limbs, ninv)


# Reduction mode for the standalone kernels: "vpu" (word-serial) or "mxu"
# (banded int8 matmuls). Benchmarked on v5e; see ROOFLINE.md.
REDUCE_MODE = "vpu"


def emit_mulmod_any(a, b, q_limbs, ninv, square: bool = False,
                    mode: str | None = None, bands=None):
    mode = mode or REDUCE_MODE
    t = emit_sq_columns(a) if square else emit_prod_columns(a, b)
    if mode == "mxu":
        return emit_mont_reduce_mxu(t, q_limbs, bands[0], bands[1])
    return emit_mont_reduce(t, q_limbs, ninv)


def _mulmod_kernel(a_ref, b_ref, o_ref, *, q_limbs, ninv):
    a = [a_ref[k, :] for k in range(NLIMB)]
    b = [b_ref[k, :] for k in range(NLIMB)]
    r = emit_mulmod_any(a, b, q_limbs, ninv, mode="vpu")
    for k in range(NLIMB):
        o_ref[k, :] = r[k]


def _mulmod_kernel_mxu(bnp_ref, bq_ref, a_ref, b_ref, o_ref, *, q_limbs,
                       ninv, square):
    a = [a_ref[k, :] for k in range(NLIMB)]
    b = a if square else [b_ref[k, :] for k in range(NLIMB)]
    r = emit_mulmod_any(a, b, q_limbs, ninv, square=square, mode="mxu",
                        bands=(bnp_ref[...], bq_ref[...]))
    for k in range(NLIMB):
        o_ref[k, :] = r[k]


def _sqmod_kernel(a_ref, o_ref, *, q_limbs, ninv):
    a = [a_ref[k, :] for k in range(NLIMB)]
    r = emit_mulmod_any(a, a, q_limbs, ninv, square=True, mode="vpu")
    for k in range(NLIMB):
        o_ref[k, :] = r[k]


def _block(tile):
    return pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


def _band_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("q_limbs", "ninv", "tile", "mode",
                                             "square"))
def _mulmod_call(a, b, q_limbs, ninv, tile, mode, square=False):
    bsize = a.shape[1]
    out = jax.ShapeDtypeStruct(a.shape, jnp.uint32)
    if mode == "mxu":
        m_np, _, m_q, _ = _mxu_consts(q_limbs)
        kern = functools.partial(_mulmod_kernel_mxu, q_limbs=q_limbs,
                                 ninv=ninv, square=square)
        return _pallas_call(
            kern,
            out_shape=out,
            grid=(bsize // tile,),
            in_specs=[_band_spec(m_np.shape), _band_spec(m_q.shape),
                      _block(tile), _block(tile)],
            out_specs=_block(tile),
        )(jnp.asarray(m_np), jnp.asarray(m_q), a, b)
    kern = functools.partial(_sqmod_kernel if square else _mulmod_kernel,
                             q_limbs=q_limbs, ninv=ninv)
    ins = [_block(tile)] if square else [_block(tile), _block(tile)]
    args = (a,) if square else (a, b)
    return _pallas_call(
        kern, out_shape=out, grid=(bsize // tile,),
        in_specs=ins, out_specs=_block(tile))(*args)


def mulmod_spec(a: jnp.ndarray, b: jnp.ndarray, spec, tile: int = 512,
                mode: str | None = None):
    """Batched Montgomery mulmod over any odd-modulus FieldSpec.

    a, b: (16, B) canonical limbs, B a multiple of `tile`.
    """
    return _mulmod_call(a, b, tuple(int(v) for v in spec.p_limbs),
                        int(spec.ninv), tile, mode or REDUCE_MODE)


def sqmod_spec(a: jnp.ndarray, spec, tile: int = 512, mode: str | None = None):
    return _mulmod_call(a, a, tuple(int(v) for v in spec.p_limbs),
                        int(spec.ninv), tile, mode or REDUCE_MODE,
                        square=True)


def mulmod(a: jnp.ndarray, b: jnp.ndarray, tile: int = 512) -> jnp.ndarray:
    """Batched Montgomery mulmod over FQ: (16, B) x (16, B) -> (16, B)."""
    return mulmod_spec(a, b, F.FQ_SPEC, tile)


# ---------------------------------------------------------------------------
# add / sub mod p
# ---------------------------------------------------------------------------

def _addmod_kernel(a_ref, b_ref, o_ref, *, q_limbs):
    cols = [a_ref[k, :] + b_ref[k, :] for k in range(NLIMB)]
    r = emit_cond_sub(emit_carry(cols), q_limbs)
    for k in range(NLIMB):
        o_ref[k, :] = r[k]


def _submod_kernel(a_ref, b_ref, o_ref, *, q_limbs):
    # a + (p - b), carried in int32, then conditional subtract
    out = []
    c = None
    for k in range(NLIMB):
        v = (a_ref[k, :].astype(jnp.int32) + jnp.int32(int(q_limbs[k]))
             - b_ref[k, :].astype(jnp.int32))
        if c is not None:
            v = v + c
        out.append((v & MASK).astype(jnp.uint32))
        c = v >> LB
    r = emit_cond_sub(out, q_limbs)
    for k in range(NLIMB):
        o_ref[k, :] = r[k]


@functools.partial(jax.jit, static_argnames=("q_limbs", "tile", "op"))
def _ewise_call(a, b, q_limbs, tile, op):
    kern = functools.partial(
        _addmod_kernel if op == "add" else _submod_kernel, q_limbs=q_limbs)
    return _pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        grid=(a.shape[1] // tile,),
        in_specs=[pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(a, b)


def _reduce_kernel(acc_ref, o_ref, *, q_limbs, ninv, n_sub):
    t = [acc_ref[k, :] for k in range(2 * NLIMB)]
    r = emit_mont_reduce(t, q_limbs, ninv, n_sub=n_sub)
    for k in range(NLIMB):
        o_ref[k, :] = r[k]


@functools.partial(jax.jit, static_argnames=("q_limbs", "ninv", "tile", "n_sub"))
def _reduce_call(acc, q_limbs, ninv, tile, n_sub):
    bsize = acc.shape[1]
    kern = functools.partial(_reduce_kernel, q_limbs=q_limbs, ninv=ninv,
                             n_sub=n_sub)
    return _pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NLIMB, bsize), jnp.uint32),
        grid=(bsize // tile,),
        in_specs=[pl.BlockSpec((2 * NLIMB, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=_block(tile),
    )(acc)


def reduce_spec(acc, spec, n_sub: int = 1, tile: int = 512):
    """Pallas Montgomery reduction of (32, B) u32 product columns.

    Columns may hold lazily-accumulated sums (bound < 2^31.6, e.g. the
    Poseidon MDS band-matmul output); `n_sub` conditional subtracts bring
    the result canonical (see Fp.dot's bound discussion).
    """
    return _reduce_call(acc, tuple(int(v) for v in spec.p_limbs),
                        int(spec.ninv), tile, n_sub)


def addmod_spec(a, b, spec, tile: int = 512):
    return _ewise_call(a, b, tuple(int(v) for v in spec.p_limbs), tile, "add")


def submod_spec(a, b, spec, tile: int = 512):
    return _ewise_call(a, b, tuple(int(v) for v in spec.p_limbs), tile, "sub")
