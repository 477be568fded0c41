"""Device-side batched point compression / decompression.

The reference decompresses one point at a time with BigInt Tonelli-Shanks
(/root/reference/src/lib.rs:192-224). Here the whole batch runs the fixed
28-round masked Tonelli-Shanks on device; byte plumbing stays host-side
(utils/codec.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import field as F
from ..utils import hostmath as H

fq = F.fq()


def _y_lt_q(y_limbs: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic y < Q over canonical limbs (reference lib.rs:199-203
    y-range rejection)."""
    p_limbs = jnp.asarray(fq.spec.p_limbs, dtype=jnp.uint32).reshape(
        (F.NLIMB,) + (1,) * (y_limbs.ndim - 1))
    lt = jnp.zeros(y_limbs.shape[1:], dtype=bool)
    decided = jnp.zeros(y_limbs.shape[1:], dtype=bool)
    for k in range(F.NLIMB - 1, -1, -1):
        limb_lt = y_limbs[k] < p_limbs[k]
        limb_gt = y_limbs[k] > p_limbs[k]
        lt = jnp.where(~decided & limb_lt, True, lt)
        decided = decided | limb_lt | limb_gt
    return lt


def _uv(y_limbs: jnp.ndarray):
    """(y_mont, u, v) with x^2 = u / v: u = 1 - y^2, v = a - d*y^2.

    v is never zero: a/d is a quadratic non-residue mod Q, so a - d*y^2
    has no root y (the reference's den-modinv at lib.rs:206-210 likewise
    can never see a zero denominator)."""
    y_m = fq.to_mont(y_limbs)
    y2 = fq.sq(y_m)
    bshape = (F.NLIMB,) + (1,) * (y_limbs.ndim - 1)
    a_c = jnp.broadcast_to(fq.const(H.A_COEFF, ()).reshape(bshape), y_m.shape)
    d_c = jnp.broadcast_to(fq.const(H.D_COEFF, ()).reshape(bshape), y_m.shape)
    u = fq.sub(fq.one_mont(y_limbs.shape[1:]), y2)
    v = fq.sub(a_c, fq.mul(d_c, y2))
    return y_m, u, v


def _sign_select(x_m: jnp.ndarray, sign: jnp.ndarray) -> jnp.ndarray:
    """Pick the root matching the wire sign bit on the canonical
    representative (reference lib.rs:217-220)."""
    x_can = fq.from_mont(x_m)
    flip = fq.gt_half_p(x_can) != sign
    return fq.select(flip, fq.neg(x_m), x_m)


def decompress(y_limbs: jnp.ndarray, sign: jnp.ndarray):
    """Batched decompression.

    y_limbs: (16, *batch) canonical little-endian limbs of y (sign bit
    already stripped); sign: (*batch,) bool.
    Returns (x_mont, y_mont, valid): Montgomery affine coords; lanes with
    valid == False correspond to the reference's Err cases (y >= Q or
    x^2 a non-residue, including x^2 == 0 which the reference rejects via
    its legendre_symbol(0) == 1 quirk combined with the a == 0 check).
    """
    y_ok = _y_lt_q(y_limbs)
    y_m, u, v = _uv(y_limbs)
    x2 = fq.mul(u, fq.inv(v))
    x_m, is_qr = fq.sqrt(x2)
    valid = y_ok & is_qr & ~fq.is_zero(x2)
    return _sign_select(x_m, sign), y_m, valid


def decompress_pair(ya_limbs, sign_a, yb_limbs, sign_b):
    """Two decompressions sharing one Fermat inversion per lane.

    Uses x = sqrt(u*v) * inv(v) (same root set as sqrt(u/v): the values
    differ by v^2, a square) so the two per-point inversions become ONE
    via the Montgomery pair-inverse trick: inv(va) = inv(va*vb)*vb,
    inv(vb) = inv(va*vb)*va — safe unconditionally because v is never
    zero (see _uv). The two Tonelli-Shanks square roots run as one
    (16, 2B) call so the fixed 28-round chain is shared too.

    Validity parity with decompress(): w = u*v == 0 iff x2 = u*inv(v) == 0
    (v nonzero), and QR(u*v) == QR(u/v).
    Returns ((xa, ya, valid_a), (xb, yb, valid_b)).
    """
    ya_ok, yb_ok = _y_lt_q(ya_limbs), _y_lt_q(yb_limbs)
    ya_m, ua, va = _uv(ya_limbs)
    yb_m, ub, vb = _uv(yb_limbs)
    wa, wb = fq.mul(ua, va), fq.mul(ub, vb)

    if wa.ndim == 2:
        # one fused sqrt chain over both points (2B lanes)
        s_all, qr_all = fq.sqrt(jnp.concatenate([wa, wb], axis=1))
        b = wa.shape[1]
        sa, sb = s_all[:, :b], s_all[:, b:]
        qr_a, qr_b = qr_all[:b], qr_all[b:]
    else:
        sa, qr_a = fq.sqrt(wa)
        sb, qr_b = fq.sqrt(wb)

    ip = fq.inv(fq.mul(va, vb))
    xa = fq.mul(sa, fq.mul(ip, vb))
    xb = fq.mul(sb, fq.mul(ip, va))
    valid_a = ya_ok & qr_a & ~fq.is_zero(wa)
    valid_b = yb_ok & qr_b & ~fq.is_zero(wb)
    return ((_sign_select(xa, sign_a), ya_m, valid_a),
            (_sign_select(xb, sign_b), yb_m, valid_b))


def compress(x_mont: jnp.ndarray, y_mont: jnp.ndarray):
    """Batched compression: returns (y canonical limbs, sign bits).

    Host assembles bytes via utils.codec.assemble_compressed_batch.
    """
    x_can = fq.from_mont(x_mont)
    y_can = fq.from_mont(y_mont)
    return y_can, fq.gt_half_p(x_can)
