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


def _mulmod_kernel(a_ref, b_ref, o_ref, *, q_limbs, ninv):
    a = [a_ref[k, :] for k in range(NLIMB)]
    b = [b_ref[k, :] for k in range(NLIMB)]
    r = emit_mulmod(a, b, q_limbs, ninv)
    for k in range(NLIMB):
        o_ref[k, :] = r[k]


@functools.partial(jax.jit, static_argnames=("q_limbs", "ninv", "tile"))
def _mulmod_call(a, b, q_limbs, ninv, tile):
    bsize = a.shape[1]
    kern = functools.partial(_mulmod_kernel, q_limbs=q_limbs, ninv=ninv)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        grid=(bsize // tile,),
        in_specs=[
            pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(a, b)


def mulmod_spec(a: jnp.ndarray, b: jnp.ndarray, spec, tile: int = 512):
    """Batched Montgomery mulmod over any odd-modulus FieldSpec.

    a, b: (16, B) canonical limbs, B a multiple of `tile`.
    """
    return _mulmod_call(a, b, tuple(int(v) for v in spec.p_limbs),
                        int(spec.ninv), tile)


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
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        grid=(a.shape[1] // tile,),
        in_specs=[pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(a, b)


def addmod_spec(a, b, spec, tile: int = 512):
    return _ewise_call(a, b, tuple(int(v) for v in spec.p_limbs), tile, "add")


def submod_spec(a, b, spec, tile: int = 512):
    return _ewise_call(a, b, tuple(int(v) for v in spec.p_limbs), tile, "sub")
