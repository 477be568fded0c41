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
def _mul_b8_core(k_s):
    return C.to_affine(C.fixed_base_mul(k_s))


@jax.jit
def _schnorr_verify_core(sg_s, px_m, py_m, h_s, rx_m, ry_m):
    left = C.fixed_base_mul(sg_s)
    pk_h = C.scalar_mul_windowed((px_m, py_m), h_s)
    right = C.add(C.to_projective((rx_m, ry_m)), pk_h)
    return C.affine_eq_proj(left, right)


def schnorr_hash_batch(pks: list, msgs: list, cs: list) -> list:
    """h = Poseidon(pk.x, pk.y, c.x, c.y, msg) as ints
    (reference lib.rs:364-373). Raises when msg > Q."""
    from .eddsa import _limbs, _points, _pad_to
    for m in msgs:
        if m > H.Q:
            raise ValueError("msg outside the Finite Field")
    n = len(pks)
    pad = _pad_to(n)
    px, py = _points(pks, pad)
    cx, cy = _points(cs, pad)
    msg_s = _limbs([m % H.Q for m in msgs], pad)
    out = np.asarray(_schnorr_hash_core(px, py, cx, cy, msg_s))[:, :n]
    return F.array_to_ints(out)


def sign_schnorr_batch(keys: list, msgs: list) -> list:
    """Batch Schnorr sign -> [((rx, ry), s)] with s unreduced."""
    from .eddsa import _limbs, _pad_to
    n = len(keys)
    pad = _pad_to(n)
    ks = [secrets.randbits(1024) for _ in keys]
    rx, ry = _mul_b8_core(_limbs([k % H.ORDER for k in ks], pad))
    r_pts = C.arrays_to_points((np.asarray(rx)[:, :n], np.asarray(ry)[:, :n]))
    px, py = _mul_b8_core(_limbs([K.scalar_key(k) for k in keys], pad))
    pks = C.arrays_to_points((np.asarray(px)[:, :n], np.asarray(py)[:, :n]))
    hs = schnorr_hash_batch(pks, msgs, r_pts)
    ss = [k + K.scalar_key(key) * h for k, key, h in zip(ks, keys, hs)]
    return list(zip(r_pts, ss))


def verify_schnorr_batch(pks: list, msgs: list, rs: list, ss: list) -> list:
    """Batch Schnorr verify: s*B8 == r + h*pk (reference lib.rs:375-385).

    Documented divergence (same contract as eddsa.verify_batch): lanes
    whose pk or r is off the curve return False instead of running the
    raw algebra on non-points."""
    from .eddsa import _limbs, _points, _pad_to
    n = len(pks)
    pad = _pad_to(n)
    on_curve = [H.is_on_curve(pk) and H.is_on_curve(r)
                for pk, r in zip(pks, rs)]
    hs = schnorr_hash_batch(pks, msgs, rs)
    sg_s = _limbs([s % H.ORDER for s in ss], pad)
    h_s = _limbs(hs, pad)  # h < Q < 2^256
    px, py = _points(pks, pad)
    rx, ry = _points(rs, pad)
    ok = np.asarray(_schnorr_verify_core(sg_s, px, py, h_s, rx, ry))[:n]
    return [bool(v and g) for v, g in zip(ok, on_curve)]
