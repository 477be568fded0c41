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
