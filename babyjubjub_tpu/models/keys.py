"""Key material: import, BLAKE-512 derivation, RFC-8032 pruning, keygen.

Parity targets:
  * PrivateKey::import     /root/reference/src/lib.rs:275-282
  * PrivateKey::scalar_key /root/reference/src/lib.rs:284-302
  * new_key                /root/reference/src/lib.rs:387-393

Key material entropy comes from the host CSPRNG (`secrets`) — never from
the deterministic JAX PRNG.
"""

from __future__ import annotations

import secrets

from ..utils import blake512
from ..utils.codec import bytes_le_to_int


def import_key(b: bytes) -> bytes:
    """Validate a raw 32-byte private key (reference lib.rs:275-282)."""
    if len(b) != 32:
        # reference error text quirk preserved ("bigger than" for any size)
        raise ValueError("imported key can not be bigger than 32 bytes")
    return bytes(b)


def new_key_bytes() -> bytes:
    """Fresh 32-byte private key from the host CSPRNG (lib.rs:387-393)."""
    return secrets.token_bytes(32)


# key-digest cache: batch signing hashes the same key once regardless of
# how many messages it signs (the reference recomputes it 3x per
# signature, lib.rs:316, 330, 335). A plain dict (not lru_cache) so the
# batch path can fill it from one vectorized digest_batch call.
_HASH_CACHE: dict = {}
_HASH_CACHE_MAX = 65536


def blake_hash(key: bytes) -> bytes:
    """64-byte BLAKE-512 of the raw key (reference `blh`, lib.rs:226-237)."""
    h = _HASH_CACHE.get(key)
    if h is None:
        h = blake512.digest(key)
        if len(_HASH_CACHE) >= _HASH_CACHE_MAX:
            _HASH_CACHE.clear()
        _HASH_CACHE[key] = h
    return h


def blake_hashes(keys: list) -> list:
    """Batch key digests: uncached keys go through ONE digest_batch call
    (native C++ or vectorized numpy) instead of a per-key python hash."""
    fresh = list({k: None for k in keys if k not in _HASH_CACHE})
    if fresh:
        if len(_HASH_CACHE) + len(fresh) > _HASH_CACHE_MAX:
            # keep the current batch's already-cached digests across the
            # eviction: clear() alone would drop them and the return
            # lookup below would KeyError on a mixed batch
            kept = {k: _HASH_CACHE[k] for k in set(keys)
                    if k in _HASH_CACHE}
            _HASH_CACHE.clear()
            _HASH_CACHE.update(kept)
        _HASH_CACHE.update(zip(fresh, blake512.digest_batch(fresh)))
    return [_HASH_CACHE[k] for k in keys]


def prune_to_scalar(h32: bytes) -> int:
    """RFC-8032 pruning of the first 32 digest bytes, then >> 3
    (reference lib.rs:290-302)."""
    h = bytearray(h32[:32])
    h[0] &= 0xF8
    h[31] &= 0x7F
    h[31] |= 0x40
    return bytes_le_to_int(h) >> 3


def scalar_key(key: bytes) -> int:
    return prune_to_scalar(blake_hash(key)[:32])


def scalar_keys(keys: list) -> list:
    """Batch scalar_key: one vectorized hashing pass over uncached keys."""
    return [prune_to_scalar(h[:32]) for h in blake_hashes(keys)]
