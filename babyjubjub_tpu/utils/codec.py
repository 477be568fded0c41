"""Wire-format codecs: 32-byte points, 64-byte signatures, 32-byte keys.

Byte layouts are bit-identical to the reference:
  * Point.compress  (/root/reference/src/lib.rs:166-178): 32 LE bytes of y,
    MSB of byte 31 set iff x > Q >> 1.
  * decompress_point (lib.rs:192-224): RFC-8032 5.2.3-style x recovery.
  * Signature wire format (lib.rs:246-268): compress(R) || 32 LE bytes of s.

Host<->limb conversions are vectorized numpy; the sqrt/inverse math of
batch decompression runs on device (ops/codec_dev.py).
"""

from __future__ import annotations

import numpy as np

from . import hostmath as H
from ..ops import field as F


# ---------------------------------------------------------------------------
# bytes <-> limbs (vectorized)
# ---------------------------------------------------------------------------

def bytes_to_limbs(data: np.ndarray) -> np.ndarray:
    """(N, 32) uint8 LE byte rows -> (16, N) uint32 16-bit limbs."""
    data = np.asarray(data, dtype=np.uint8)
    lo = data[:, 0::2].astype(np.uint32)
    hi = data[:, 1::2].astype(np.uint32)
    return (lo | (hi << 8)).T.copy()


def limbs_to_bytes(limbs: np.ndarray) -> np.ndarray:
    """(16, N) uint32 16-bit limbs -> (N, 32) uint8 LE byte rows."""
    limbs = np.asarray(limbs, dtype=np.uint32).T  # (N, 16)
    out = np.empty((limbs.shape[0], 32), dtype=np.uint8)
    out[:, 0::2] = limbs & 0xFF
    out[:, 1::2] = (limbs >> 8) & 0xFF
    return out


def int_to_bytes32_le(x: int) -> bytes:
    return int(x).to_bytes(32, "little")


def bytes_le_to_int(b) -> int:
    return int.from_bytes(bytes(b), "little")


# ---------------------------------------------------------------------------
# single-item codecs (exact reference semantics, host ints)
# ---------------------------------------------------------------------------

def compress_point(p: tuple) -> bytes:
    """(x, y) ints -> 32 bytes (reference lib.rs:166-178)."""
    x, y = p
    r = bytearray(int_to_bytes32_le(y))
    if x > (H.Q >> 1):
        r[31] |= 0x80
    return bytes(r)


def decompress_point(bb: bytes) -> tuple:
    """32 bytes -> (x, y) ints; raises ValueError like the reference errors.

    Mirrors lib.rs:192-224 including the sign convention and validation
    surface (y >= Q rejected; non-residue x^2 rejected).
    """
    b = bytearray(bb)
    sign = bool(b[31] & 0x80)
    b[31] &= 0x7F
    y = bytes_le_to_int(b)
    if y >= H.Q:
        raise ValueError("y outside the Finite Field over R")
    den = H.modinv(H.modulus(H.A_COEFF - H.modulus(H.D_COEFF * y * y, H.Q), H.Q), H.Q)
    x2 = H.modulus((1 - H.modulus(y * y, H.Q)) * den, H.Q)
    x = H.modsqrt(x2, H.Q)  # raises on non-residue
    if (sign and x <= (H.Q >> 1)) or ((not sign) and x > (H.Q >> 1)):
        x = -x
    x = H.modulus(x, H.Q)
    return (x, y)


def compress_signature(r_b8: tuple, s: int) -> bytes:
    """Signature -> 64 bytes (reference lib.rs:246-258)."""
    return compress_point(r_b8) + int_to_bytes32_le(s)


def decompress_signature(b: bytes) -> tuple:
    """64 bytes -> ((rx, ry), s) (reference lib.rs:260-268)."""
    if len(b) != 64:
        raise ValueError("signature must be 64 bytes")
    r_b8 = decompress_point(b[:32])
    s = bytes_le_to_int(b[32:])
    return r_b8, s


# ---------------------------------------------------------------------------
# batch byte plumbing
# ---------------------------------------------------------------------------

def split_compressed_batch(rows: np.ndarray):
    """(N, 32) uint8 compressed points -> (y limbs (16,N), sign (N,) bool)."""
    rows = np.array(rows, dtype=np.uint8, copy=True)
    sign = (rows[:, 31] & 0x80) != 0
    rows[:, 31] &= 0x7F
    return bytes_to_limbs(rows), sign


def assemble_compressed_batch(y_limbs: np.ndarray, sign_bit: np.ndarray) -> np.ndarray:
    """y limbs (16,N) + sign (N,) -> (N, 32) uint8 compressed points."""
    rows = limbs_to_bytes(y_limbs)
    rows[:, 31] |= (np.asarray(sign_bit, dtype=np.uint8) << 7)
    return rows
