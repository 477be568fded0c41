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


# ---------------------------------------------------------------------------
# Off-curve input surface (VERDICT r2 missing #2)
# ---------------------------------------------------------------------------

def _off_curve_point():
    x, y = H.B8
    p = (x, (y + 1) % H.Q)
    assert not H.is_on_curve(p)
    return p


def test_mul_scalar_any_matches_group_model_on_curve():
    """The host projective model (reference lib.rs:149-164 semantics,
    unreduced scalar) agrees with the group-exact model for on-curve
    points, including ORDER-overflowing and Schnorr-sized scalars."""
    import random
    rng = random.Random(42)
    for n in (0, 1, 3, H.SUBORDER - 1, H.ORDER + 12345,
              rng.randrange(1 << 1024)):
        assert H.mul_scalar_any(H.B8, n) == H.mul_scalar(H.B8, n % H.ORDER)


def test_mul_scalar_off_curve_reduction_diverges():
    """Off the curve the formulas are not a group: reducing the scalar
    mod ORDER gives a DIFFERENT answer than the reference's unreduced
    ladder — this pins that the hole is real, and that the single-item
    API preserves reference semantics by routing off-curve points
    through the unreduced host model."""
    p = _off_curve_point()
    n = H.ORDER + 987654321
    unreduced = H.mul_scalar_any(p, n)
    reduced = H.mul_scalar_any(p, n % H.ORDER)
    assert unreduced != reduced  # reduction is NOT exact off-curve
    got = bjj.Point(*p).mul_scalar(n)
    assert (got.x, got.y) == unreduced


def test_mul_scalar_off_curve_small_scalar():
    """Small scalars never reduce, so host model vs single-item API is a
    pure formula-parity check on off-curve inputs."""
    p = _off_curve_point()
    for n in (1, 2, 3, 17):
        got = bjj.Point(*p).mul_scalar(n)
        assert (got.x, got.y) == H.mul_scalar_any(p, n)


def test_verify_off_curve_pk_or_r_false():
    """Documented divergence: off-curve pk or R lanes verify False
    (the reference would run the raw algebra on the non-point)."""
    sk = bjj.PrivateKey(KEY)
    pk = sk.public()
    sig = sk.sign(77)
    bad = _off_curve_point()
    assert eddsa.verify_batch([(pk.x, pk.y)], [((sig.r_b8.x, sig.r_b8.y),
                                                sig.s)], [77]) == [True]
    assert eddsa.verify_batch([bad], [((sig.r_b8.x, sig.r_b8.y), sig.s)],
                              [77]) == [False]
    assert eddsa.verify_batch([(pk.x, pk.y)], [(bad, sig.s)], [77]) == [False]


def test_verify_schnorr_off_curve_false():
    sk = bjj.PrivateKey(KEY)
    r, s = sk.sign_schnorr(99)
    pk = sk.public()
    assert bjj.verify_schnorr(pk, 99, r, s)
    bad = _off_curve_point()
    assert schnorr.verify_schnorr_batch([bad], [99], [(r.x, r.y)],
                                        [s]) == [False]
    assert schnorr.verify_schnorr_batch([(pk.x, pk.y)], [99], [bad],
                                        [s]) == [False]
