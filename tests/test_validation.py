"""Reference validation-surface quirks (SURVEY.md section 5.3).

The reference's error behavior is part of the compatibility contract:
  * sign rejects msg > Q but ACCEPTS msg == Q, which wraps to Fr 0 at
    Fr::from_str (lib.rs:309-311, 321) — strictly greater, not >=.
  * verify returns false (no exception) for msg > Q (lib.rs:396-398).
  * PrivateKey import rejects wrong key lengths (lib.rs:275-282).
  * schnorr_hash rejects msg > Q (lib.rs:365-367).
"""

import pytest

import babyjubjub_tpu as bjj
from babyjubjub_tpu.models import eddsa, schnorr
from babyjubjub_tpu.utils import hostmath as H

KEY = bytes.fromhex(
    "0001020304050607080900010203040506070809000102030405060708090001")


def test_sign_msg_eq_q_wraps():
    sk = bjj.PrivateKey(KEY)
    sig_q = sk.sign(H.Q)       # msg == Q passes the > check, wraps to 0
    sig_0 = sk.sign(0)
    # same Poseidon input (Fr 0), same deterministic nonce derivation?
    # The nonce hashes the raw msg bytes, which DIFFER (Q vs 0), so the
    # signatures differ — but both must verify under their own msg.
    assert bjj.verify(sk.public(), sig_q, H.Q)
    assert bjj.verify(sk.public(), sig_0, 0)


def test_sign_msg_above_q_raises():
    sk = bjj.PrivateKey(KEY)
    with pytest.raises(ValueError):
        sk.sign(H.Q + 1)


def test_verify_msg_above_q_false():
    sk = bjj.PrivateKey(KEY)
    sig = sk.sign(123)
    assert bjj.verify(sk.public(), sig, H.Q + 1) is False


def test_import_key_length():
    with pytest.raises(ValueError):
        bjj.PrivateKey(b"\x00" * 31)
    with pytest.raises(ValueError):
        bjj.PrivateKey(b"\x00" * 33)


def test_schnorr_hash_msg_above_q():
    pk = bjj.PrivateKey(KEY).public()
    with pytest.raises(ValueError):
        schnorr.schnorr_hash_batch([(pk.x, pk.y)], [H.Q + 1],
                                   [(pk.x, pk.y)])


def test_decompress_y_out_of_field():
    with pytest.raises(ValueError):
        bjj.decompress_point((H.Q).to_bytes(32, "little"))


def _host_verify(pk, sig, msg):
    """Pure-host reference-semantics verify (lib.rs:395-412): L = s*B8,
    R' = R + (8*hm)*A, unreduced scalars, no subgroup checks."""
    from babyjubjub_tpu.ops import poseidon as P
    (rx, ry), s = sig
    hm = P.hash_host([rx, ry, pk[0], pk[1], msg % H.Q])
    left = H.mul_scalar(H.B8, s)
    right = H.point_add((rx, ry), H.mul_scalar(pk, 8 * hm))
    return left == right


def test_verify_malleable_s_parity():
    """The reference never range-checks s (decompress_signature and
    verify accept any BigInt, lib.rs:260-268, 405): s + k*SUBORDER still
    verifies because B8 has order SUBORDER. Pin parity with the host
    reference model for s >= SUBORDER."""
    sk = bjj.PrivateKey(KEY)
    pk = sk.public()
    sig = sk.sign(99)
    base = ((sig.r_b8.x, sig.r_b8.y), sig.s)
    variants = [sig.s + H.SUBORDER, sig.s + 2 * H.SUBORDER, sig.s + 1]
    sigs = [(base[0], s) for s in variants]
    got = eddsa.verify_batch([(pk.x, pk.y)] * 3, sigs, [99] * 3)
    want = [_host_verify((pk.x, pk.y), sg, 99) for sg in sigs]
    assert got == want == [True, True, False]


def test_verify_low_order_pk_parity():
    """The reference does no subgroup check on decompressed points
    (lib.rs:192-224): a low-order public key flows straight into the
    verify equation. (0, -1) has order 2 and 8*hm is even, so
    (R=identity, s=0) \"verifies\" — pin that quirk against the host
    model rather than silently diverging."""
    low = (0, H.Q - 1)              # order-2 point (on curve: y^2 = 1)
    assert H.is_on_curve(low)
    sig = ((0, 1), 0)               # R = identity, s = 0
    for msg in (5, 77777):
        want = _host_verify(low, sig, msg)
        got = eddsa.verify_batch([low], [sig], [msg])[0]
        assert got == want is True

    # order-8 subgroup point: 8*hm*A == identity as well
    # (any curve point P: 8*hm*P has the prime-order component killed
    # only when P is low-order; pick P8 = (ORDER/8-torsion) via doubling
    # a generator of the full group is unavailable host-side, so use the
    # order-2 case plus a wrong-subgroup composite: A = B8 + low.)
    comp = H.point_add(H.B8, low)   # wrong-subgroup composite point
    got = eddsa.verify_batch([comp], [sig], [5])[0]
    want = _host_verify(comp, sig, 5)
    assert got == want


def test_verify_identity_pk_parity():
    """A = identity: the equation collapses to s*B8 == R; parity with
    the host model for both a trivially-true and a false instance."""
    ident = (0, 1)
    sk = bjj.PrivateKey(KEY)
    real = sk.sign(42)
    sigs = [((0, 1), 0), (((real.r_b8.x, real.r_b8.y)), real.s)]
    got = eddsa.verify_batch([ident] * 2, sigs, [42] * 2)
    want = [_host_verify(ident, sg, 42) for sg in sigs]
    assert got == want == [True, False]


def test_sign_deterministic():
    """Determinism (SURVEY 5.2): same key+msg -> bit-identical signature
    bytes across invocations (nonce is derived, not random —
    lib.rs:316-328)."""
    sk = bjj.PrivateKey(KEY)
    a = sk.sign(424242).compress()
    b = sk.sign(424242).compress()
    assert a == b
    # batch and single-item paths agree bit-exactly too
    (r, s), = eddsa.sign_batch([KEY], [424242])
    assert bjj.Signature(bjj.Point(*r), s).compress() == a
