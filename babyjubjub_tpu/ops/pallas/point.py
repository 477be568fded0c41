"""Fused Pallas kernels for twisted-Edwards point operations.

One kernel per group op: all ~8-11 field multiplications of a point
double / unified add run as straight-line limb code inside a single
kernel — intermediates never touch HBM, and per-mul kernel-launch
overhead disappears. Formula parity: add-2008-bbjlp unified addition
(reference /root/reference/src/lib.rs:88-131) and dbl-2008-bbjlp.

Montgomery-domain u32 16-bit limbs, (16, B) layout, B tiled by 512 lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import field as F
from . import mulmod as MK
from ...utils import hostmath as H


def _pallas_call(*args, **kwargs):
    """pallas_call with the module INTERPRET switch (see fast13.py)."""
    from . import fast13
    return pl.pallas_call(*args, interpret=fast13.INTERPRET, **kwargs)


NLIMB = F.NLIMB
SPEC = F.FQ_SPEC
_QL = tuple(int(v) for v in SPEC.p_limbs)
_NINV = int(SPEC.ninv)

_A_M = tuple(int(v) for v in F.int_to_limbs(SPEC.to_mont_int(H.A_COEFF)))
_D_M = tuple(int(v) for v in F.int_to_limbs(SPEC.to_mont_int(H.D_COEFF)))


def _mul(a, b):
    return MK.emit_mulmod(a, b, _QL, _NINV)


def _sq(a):
    return MK.emit_mont_reduce(MK.emit_sq_columns(a), _QL, _NINV)


def _mul_const(c_limbs, b):
    c = [jnp.full_like(b[0], int(v)) for v in c_limbs]
    return MK.emit_mulmod(c, b, _QL, _NINV)


def _add(a, b):
    cols = [x + y for x, y in zip(a, b)]
    return MK.emit_cond_sub(MK.emit_carry(cols), _QL)


def _sub(a, b):
    out = []
    c = None
    for k in range(NLIMB):
        v = a[k].astype(jnp.int32) + jnp.int32(_QL[k]) - b[k].astype(jnp.int32)
        if c is not None:
            v = v + c
        out.append((v & F.MASK).astype(jnp.uint32))
        c = v >> F.LIMB_BITS
    return MK.emit_cond_sub(out, _QL)


def emit_point_add(p, q):
    """Unified add: p, q = (x, y, z) lists of 16 limb vectors each."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    a = _mul(z1, z2)
    b = _mul(a, a)
    c = _mul(x1, x2)
    d = _mul(y1, y2)
    e = _mul(_mul_const(_D_M, c), d)
    f = _sub(b, e)
    g = _add(b, e)
    aux = _sub(_sub(_mul(_add(x1, y1), _add(x2, y2)), c), d)
    x3 = _mul(_mul(a, f), aux)
    dac = _sub(d, _mul_const(_A_M, c))
    y3 = _mul(_mul(a, g), dac)
    z3 = _mul(f, g)
    return (x3, y3, z3)


def emit_point_double(p):
    x1, y1, z1 = p
    b = _sq(_add(x1, y1))
    c = _sq(x1)
    d = _sq(y1)
    e = _mul_const(_A_M, c)
    f = _add(e, d)
    h = _sq(z1)
    j = _sub(f, _add(h, h))
    x3 = _mul(_sub(_sub(b, c), d), j)
    y3 = _mul(f, _sub(e, d))
    z3 = _mul(f, j)
    return (x3, y3, z3)


def _rd(ref):
    return [ref[k, :] for k in range(NLIMB)]


def _wr(ref, limbs):
    for k in range(NLIMB):
        ref[k, :] = limbs[k]


def _dbl_kernel(x_ref, y_ref, z_ref, ox, oy, oz):
    r = emit_point_double((_rd(x_ref), _rd(y_ref), _rd(z_ref)))
    _wr(ox, r[0])
    _wr(oy, r[1])
    _wr(oz, r[2])


def _add_kernel(x1r, y1r, z1r, x2r, y2r, z2r, ox, oy, oz):
    r = emit_point_add((_rd(x1r), _rd(y1r), _rd(z1r)),
                       (_rd(x2r), _rd(y2r), _rd(z2r)))
    _wr(ox, r[0])
    _wr(oy, r[1])
    _wr(oz, r[2])


def _specs(n_in, tile):
    bs = pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    return [bs] * n_in, (bs, bs, bs)


@functools.partial(jax.jit, static_argnames=("tile",))
def point_double(x, y, z, tile: int = 512):
    ins, outs = _specs(3, tile)
    sh = jax.ShapeDtypeStruct(x.shape, jnp.uint32)
    return _pallas_call(
        _dbl_kernel, out_shape=(sh, sh, sh), grid=(x.shape[1] // tile,),
        in_specs=ins, out_specs=outs)(x, y, z)


@functools.partial(jax.jit, static_argnames=("tile",))
def point_add(x1, y1, z1, x2, y2, z2, tile: int = 512):
    ins, outs = _specs(6, tile)
    sh = jax.ShapeDtypeStruct(x1.shape, jnp.uint32)
    return _pallas_call(
        _add_kernel, out_shape=(sh, sh, sh), grid=(x1.shape[1] // tile,),
        in_specs=ins, out_specs=outs)(x1, y1, z1, x2, y2, z2)


def _roll_lanes(v, off: int):
    """Circular lane rotation of a (tile,) vector. Real Mosaic uses the
    TPU lane-roll on a (1, tile) 2D view (tpu.dynamic_rotate rejects 1D
    vectors: "Unsupported 1D shape"); the XLA interpret lowering (CPU
    tests) lacks the primitive entirely, so it falls back to jnp.roll."""
    from . import fast13
    if fast13.INTERPRET:
        return jnp.roll(v, off)
    return pltpu.roll(v.reshape(1, v.shape[0]), off, 1).reshape(v.shape)


def _sum_kernel(x_ref, y_ref, z_ref, ox, oy, oz, acc, *, tile, ngrid):
    """Whole-batch point sum in ONE kernel: grid step j adds its (16,
    tile) block of points into a running (3, 16, tile) scratch
    accumulator (scratch persists across the sequential TPU grid), and
    the final step all-reduces the tile's lanes with a butterfly of
    circular lane-rolls (log2(tile) unified adds; afterwards EVERY lane
    holds the total, so the caller reads lane 0).

    Replaces the former log2(B) chain of separate point_add launches
    whose tail levels under-filled the 512-lane tile and, below the
    tile, fell off the kernel path onto the ~100x slower generic-limb
    XLA adds — measured 12 of 22.7 ms per B=16384 MSM (VERDICT r4 #5).
    """
    j = pl.program_id(0)
    p = (_rd(x_ref), _rd(y_ref), _rd(z_ref))

    def _read_acc():
        return tuple([acc[c, k, :] for k in range(NLIMB)]
                     for c in range(3))

    def _write_acc(r):
        for c in range(3):
            for k in range(NLIMB):
                acc[c, k, :] = r[c][k]

    @pl.when(j == 0)
    def _init():
        _write_acc(p)

    @pl.when(j > 0)
    def _accumulate():
        _write_acc(emit_point_add(_read_acc(), p))

    @pl.when(j == ngrid - 1)
    def _fold_and_emit():
        a = _read_acc()
        off = 1
        while off < tile:
            rolled = tuple([_roll_lanes(a[c][k], off)
                            for k in range(NLIMB)] for c in range(3))
            a = emit_point_add(a, rolled)
            off *= 2
        _wr(ox, a[0])
        _wr(oy, a[1])
        _wr(oz, a[2])


@functools.partial(jax.jit, static_argnames=("tile",))
def point_sum(x, y, z, tile: int = 512):
    """(16, B) projective batch -> (16, tile) whose every lane is the
    projective sum of all B points (callers slice [:, :1]). B must be a
    multiple of tile."""
    bsize = x.shape[1]
    ngrid = bsize // tile
    bs = pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((NLIMB, tile), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    sh = jax.ShapeDtypeStruct((NLIMB, tile), jnp.uint32)
    return _pallas_call(
        functools.partial(_sum_kernel, tile=tile, ngrid=ngrid),
        out_shape=(sh, sh, sh), grid=(ngrid,),
        in_specs=[bs, bs, bs], out_specs=(os, os, os),
        scratch_shapes=[pltpu.VMEM((3, NLIMB, tile), jnp.uint32)],
    )(x, y, z)
