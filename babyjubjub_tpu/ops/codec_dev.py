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


def decompress(y_limbs: jnp.ndarray, sign: jnp.ndarray):
    """Batched decompression.

    y_limbs: (16, *batch) canonical little-endian limbs of y (sign bit
    already stripped); sign: (*batch,) bool.
    Returns (x_mont, y_mont, valid): Montgomery affine coords; lanes with
    valid == False correspond to the reference's Err cases (y >= Q or
    x^2 a non-residue, including x^2 == 0 which the reference rejects via
    its legendre_symbol(0) == 1 quirk combined with the a == 0 check).
    """
    # y < Q check (lexicographic from MSB)
    p_limbs = jnp.asarray(fq.spec.p_limbs, dtype=jnp.uint32).reshape(
        (F.NLIMB,) + (1,) * (y_limbs.ndim - 1))
    lt = jnp.zeros(y_limbs.shape[1:], dtype=bool)
    decided = jnp.zeros(y_limbs.shape[1:], dtype=bool)
    for k in range(F.NLIMB - 1, -1, -1):
        limb_lt = y_limbs[k] < p_limbs[k]
        limb_gt = y_limbs[k] > p_limbs[k]
        lt = jnp.where(~decided & limb_lt, True, lt)
        decided = decided | limb_lt | limb_gt
    y_ok = lt  # y < Q

    y_m = fq.to_mont(y_limbs)
    y2 = fq.sq(y_m)
    a_c = fq.const(H.A_COEFF, ())
    d_c = fq.const(H.D_COEFF, ())
    one = fq.one_mont(y_limbs.shape[1:])
    den = fq.sub(jnp.broadcast_to(a_c.reshape((F.NLIMB,) + (1,) * (y_limbs.ndim - 1)),
                                  y_m.shape),
                 fq.mul(jnp.broadcast_to(
                     d_c.reshape((F.NLIMB,) + (1,) * (y_limbs.ndim - 1)),
                     y_m.shape), y2))
    x2 = fq.mul(fq.sub(one, y2), fq.inv(den))
    x_m, is_qr = fq.sqrt(x2)
    valid = y_ok & is_qr & ~fq.is_zero(x2)

    # sign selection on the canonical representative (reference lib.rs:217-220)
    x_can = fq.from_mont(x_m)
    flip = fq.gt_half_p(x_can) != sign
    x_m = fq.select(flip, fq.neg(x_m), x_m)
    return x_m, y_m, valid


def compress(x_mont: jnp.ndarray, y_mont: jnp.ndarray):
    """Batched compression: returns (y canonical limbs, sign bits).

    Host assembles bytes via utils.codec.assemble_compressed_batch.
    """
    x_can = fq.from_mont(x_mont)
    y_can = fq.from_mont(y_mont)
    return y_can, fq.gt_half_p(x_can)
