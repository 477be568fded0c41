"""Schnorr signatures over BabyJubJub (reference lib.rs:344-385).

sign_schnorr: k is a fresh 1024-bit CSPRNG scalar (host `secrets`,
mirroring the reference's `gen_biguint(1024)` at lib.rs:347-348); s = k +
sk*h is returned UNREDUCED (arbitrary precision), exactly like the
reference (lib.rs:359) — so it round-trips through verify the same way.

All point math runs on the device batch pipelines; scalars are reduced
mod ORDER before the ladders, which is group-exact for every point.
"""

from __future__ import annotations

import secrets

import jax
import numpy as np
import jax.numpy as jnp

from ..ops import field as F, curve as C, poseidon as P
from ..utils import hostmath as H
from . import keys as K

fq = F.fq()


@jax.jit
def _schnorr_hash_core(px, py, cx, cy, msg_s):
    msg_m = fq.to_mont(msg_s)
    hm_in = jnp.stack([px, py, cx, cy, msg_m], axis=1)
    return fq.from_mont(P.hash_mont(hm_in))


@jax.jit
def _schnorr_hash_core_canon(px_c, py_c, cx_c, cy_c, msg_s):
    """Canonical-limb point inputs; Montgomery conversion on device."""
    msg_m = fq.to_mont(msg_s)
    hm_in = jnp.stack([fq.to_mont(px_c), fq.to_mont(py_c),
                       fq.to_mont(cx_c), fq.to_mont(cy_c), msg_m], axis=1)
    return fq.from_mont(P.hash_mont(hm_in))


@jax.jit
def _mul_b8_core(k_s):
    return C.to_affine(C.fixed_base_mul(k_s))


@jax.jit
def _mul_b8_core_canon(k_s):
    x, y = C.to_affine(C.fixed_base_mul(k_s))
    return fq.from_mont(x), fq.from_mont(y)


def _schnorr_verify(sg_s, px_m, py_m, h_s, rx_m, ry_m):
    left = C.fixed_base_mul(sg_s)
    pk_h = C.scalar_mul_windowed((px_m, py_m), h_s)
    right = C.add(C.to_projective((rx_m, ry_m)), pk_h)
    return C.affine_eq_proj(left, right)


_schnorr_verify_core = jax.jit(_schnorr_verify)


@jax.jit
def _schnorr_verify_core_canon(sg_s, px_c, py_c, h_s, rx_c, ry_c):
    """Canonical-limb inputs: Montgomery conversion + on-curve validation
    on device (same contract/rationale as eddsa.verify_core_canon)."""
    px, py = fq.to_mont(px_c), fq.to_mont(py_c)
    rx, ry = fq.to_mont(rx_c), fq.to_mont(ry_c)
    ok = C.on_curve(px, py) & C.on_curve(rx, ry)
    return _schnorr_verify(sg_s, px, py, h_s, rx, ry) & ok


def schnorr_hash_batch(pks: list, msgs: list, cs: list) -> list:
    """h = Poseidon(pk.x, pk.y, c.x, c.y, msg) as ints
    (reference lib.rs:364-373). Raises when msg > Q."""
    from .eddsa import _limbs, _points, _pad_to
    for m in msgs:
        if m > H.Q:
            raise ValueError("msg outside the Finite Field")
    n = len(pks)
    pad = _pad_to(n)
    px, py = _points(pks, pad, mont=False)
    cx, cy = _points(cs, pad, mont=False)
    msg_s = _limbs([m % H.Q for m in msgs], pad)
    out = np.asarray(_schnorr_hash_core_canon(px, py, cx, cy, msg_s))[:, :n]
    return F.array_to_ints(out)


def sign_schnorr_batch(keys: list, msgs: list) -> list:
    """Batch Schnorr sign -> [((rx, ry), s)] with s unreduced."""
    from .eddsa import _limbs, _pad_to
    n = len(keys)
    pad = _pad_to(n)
    ks = [secrets.randbits(1024) for _ in keys]
    rx, ry = _mul_b8_core_canon(_limbs([k % H.ORDER for k in ks], pad))
    r_pts = C.arrays_to_points(
        (np.asarray(rx)[:, :n], np.asarray(ry)[:, :n]), mont=False)
    sks = K.scalar_keys(keys)
    px, py = _mul_b8_core_canon(_limbs(sks, pad))
    pks = C.arrays_to_points(
        (np.asarray(px)[:, :n], np.asarray(py)[:, :n]), mont=False)
    hs = schnorr_hash_batch(pks, msgs, r_pts)
    ss = [k + sk * h for k, sk, h in zip(ks, sks, hs)]
    return list(zip(r_pts, ss))


def verify_schnorr_batch(pks: list, msgs: list, rs: list, ss: list) -> list:
    """Batch Schnorr verify: s*B8 == r + h*pk (reference lib.rs:375-385).

    Documented divergence (same contract as eddsa.verify_batch): lanes
    whose pk or r is off the curve return False instead of running the
    raw algebra on non-points."""
    from .eddsa import _limbs, _points, _pad_to
    n = len(pks)
    pad = _pad_to(n)
    hs = schnorr_hash_batch(pks, msgs, rs)
    sg_s = _limbs([s % H.ORDER for s in ss], pad)
    h_s = _limbs(hs, pad)  # h < Q < 2^256
    px, py = _points(pks, pad, mont=False)
    rx, ry = _points(rs, pad, mont=False)
    ok = np.asarray(_schnorr_verify_core_canon(
        sg_s, px, py, h_s, rx, ry))[:n]
    return [bool(v) for v in ok]
