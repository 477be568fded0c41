"""babyjubjub_tpu — a TPU-native BabyJubJub framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
`arnaucube/babyjubjub-rs` (reference at /root/reference): BabyJubJub
twisted-Edwards curve ops, EdDSA-Poseidon ("Baby-EdDSA") and Schnorr
signatures, RFC-8032-style compression, BLAKE-512 key derivation — all
bit-compatible with circomlib/go-iden3-crypto test vectors, but designed
batch-first: every protocol stage is a batched, branch-free, jit-compiled
device pipeline that shards over TPU meshes (see babyjubjub_tpu.parallel).

This module exposes the single-item convenience API mirroring the
reference's public surface (lib.rs: Point, PrivateKey, Signature, verify,
...). Single items run through the same device pipelines with batch = 1;
the batch/throughput APIs live in `babyjubjub_tpu.models` and
`babyjubjub_tpu.parallel`.
"""

from __future__ import annotations

from dataclasses import dataclass

from .utils import hostmath as _H
from .utils import codec as _codec
from .utils import config as config  # applies env-driven settings on import
from .utils import cachefix as _cachefix

_cachefix.apply()  # deterministic Mosaic-kernel cache keys (see module doc)
from .models import keys as _keys, eddsa as _eddsa, schnorr as _schnorr

# Public constants (reference lib.rs:28-60)
Q = _H.Q
ORDER = _H.ORDER
SUBORDER = _H.SUBORDER
A = _H.A_COEFF
D = _H.D_COEFF


@dataclass(frozen=True)
class Point:
    """Affine BabyJubJub point over canonical python ints
    (reference lib.rs:134-190)."""
    x: int
    y: int

    def compress(self) -> bytes:
        return _codec.compress_point((self.x, self.y))

    def equals(self, other: "Point") -> bool:
        return self.x == other.x and self.y == other.y

    def mul_scalar(self, n: int) -> "Point":
        """Scalar multiplication (any-size n, like reference lib.rs:149-164).

        On-curve points run the batched device ladder with the scalar
        reduced mod ORDER (group-exact: every point order divides ORDER,
        so this is bit-equal to the reference's unreduced LSB-first
        ladder). Off-curve (x, y) — which the reference happily feeds
        through the raw add formulas — are routed through the host
        projective model with the scalar UNREDUCED, preserving bit-exact
        reference semantics where reduction would diverge.
        """
        if not _H.is_on_curve((self.x, self.y)):
            return Point(*_H.mul_scalar_any((self.x, self.y), n))
        from .ops import field as F, curve as C
        ba = C.points_to_arrays([(self.x, self.y)])
        sa = F.ints_to_array([n % _H.ORDER])
        (xr, yr), = C.arrays_to_points(_mul_jit(ba, sa))
        return Point(xr, yr)

    def on_curve(self) -> bool:
        return _H.is_on_curve((self.x, self.y))


@dataclass(frozen=True)
class PointProjective:
    """Projective point over python ints (reference lib.rs:62-132).

    Single-item convenience mirror of the reference's PointProjective;
    the batch pipelines use projective limb-array tuples internally."""
    x: int
    y: int
    z: int

    def affine(self) -> "Point":
        # z == 0 -> (0, 0), matching reference lib.rs:70-76
        if self.z % _H.Q == 0:
            return Point(0, 0)
        zi = pow(self.z, _H.Q - 2, _H.Q)
        return Point(self.x * zi % _H.Q, self.y * zi % _H.Q)

    def add(self, q: "PointProjective") -> "PointProjective":
        """Direct projective unified addition, add-2008-bbjlp — the same
        formula as reference lib.rs:88-131, so degenerate z == 0 operands
        flow through the algebra identically (no affine round-trip)."""
        p = _H.Q
        a = self.z * q.z % p
        b = a * a % p
        c = self.x * q.x % p
        d = self.y * q.y % p
        e = _H.D_COEFF * c * d % p
        f = (b - e) % p
        g = (b + e) % p
        x3 = a * f * ((self.x + self.y) * (q.x + q.y) - c - d) % p
        y3 = a * g * (d - _H.A_COEFF * c) % p
        z3 = f * g % p
        return PointProjective(x3, y3, z3)


def _point_projective(self) -> "PointProjective":
    """Affine -> projective (reference lib.rs:141-147)."""
    return PointProjective(self.x, self.y, 1)


Point.projective = _point_projective


def test_bit(b: bytes, i: int) -> bool:
    """Bit i of a little-endian byte string (reference lib.rs:188-190)."""
    return (b[i // 8] & (1 << (i % 8))) != 0


import functools as _functools


@_functools.lru_cache(maxsize=1)
def _mul_jit_fn():
    from .ops import curve as C
    import jax
    return jax.jit(C.scalar_mul_windowed_affine)


def _mul_jit(ba, sa):
    return _mul_jit_fn()(ba, sa)


B8 = Point(*_H.B8)


@dataclass(frozen=True)
class Signature:
    """EdDSA-Poseidon signature (reference lib.rs:239-258)."""
    r_b8: Point
    s: int

    def compress(self) -> bytes:
        return _codec.compress_signature((self.r_b8.x, self.r_b8.y), self.s)


def decompress_point(bb: bytes) -> Point:
    """32 bytes -> Point; raises ValueError on invalid encodings
    (reference lib.rs:192-224)."""
    x, y = _codec.decompress_point(bb)
    return Point(x, y)


def decompress_signature(b: bytes) -> Signature:
    r, s = _codec.decompress_signature(b)
    return Signature(Point(*r), s)


class PrivateKey:
    """32-byte private key (reference lib.rs:270-362)."""

    def __init__(self, key: bytes):
        self.key = _keys.import_key(key)

    # reference: PrivateKey::import
    @classmethod
    def import_(cls, b: bytes) -> "PrivateKey":
        return cls(b)

    def scalar_key(self) -> int:
        return _keys.scalar_key(self.key)

    def public(self) -> Point:
        return Point(*_eddsa.public_batch([self.key])[0])

    def sign(self, msg: int) -> Signature:
        (r, s), = _eddsa.sign_batch([self.key], [msg])
        return Signature(Point(*r), s)

    def sign_schnorr(self, msg: int):
        ((r, s),) = _schnorr.sign_schnorr_batch([self.key], [msg])
        return Point(*r), s


def new_key() -> PrivateKey:
    return PrivateKey(_keys.new_key_bytes())


def verify(pk: Point, sig: Signature, msg: int) -> bool:
    """EdDSA-Poseidon verification (reference lib.rs:395-412)."""
    return _eddsa.verify_batch([(pk.x, pk.y)],
                               [((sig.r_b8.x, sig.r_b8.y), sig.s)],
                               [msg])[0]


def schnorr_hash(pk: Point, msg: int, c: Point) -> int:
    return _schnorr.schnorr_hash_batch([(pk.x, pk.y)], [msg],
                                       [(c.x, c.y)])[0]


def verify_schnorr(pk: Point, m: int, r: Point, s: int) -> bool:
    return _schnorr.verify_schnorr_batch([(pk.x, pk.y)], [m],
                                         [(r.x, r.y)], [s])[0]


__all__ = [
    "Q", "ORDER", "SUBORDER", "A", "D", "B8",
    "Point", "PointProjective", "Signature", "PrivateKey",
    "decompress_point", "decompress_signature", "test_bit",
    "new_key", "verify", "schnorr_hash", "verify_schnorr",
]
