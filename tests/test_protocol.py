"""Protocol golden tests: the reference's own test suite, ported.

Sources (reference /root/reference/src/lib.rs):
  * test_circomlib_testvector  lib.rs:689-738  (the master KAT)
  * test_new_key_sign_verify   lib.rs:554-572
  * test_signature_compress_decompress lib.rs:656-675
  * test_schnorr_signature     lib.rs:677-686
"""

import pytest

import babyjubjub_tpu as bjj
from babyjubjub_tpu.models import eddsa, keys, schnorr
from babyjubjub_tpu.utils import blake512, hostmath as H

KEY_HEX = "0001020304050607080900010203040506070809000102030405060708090001"
KEY = bytes.fromhex(KEY_HEX)
MSG = int.from_bytes(bytes.fromhex("00010203040506070809"), "little")


def test_blake512_golden():
    # reference lib.rs:694-696
    assert blake512.digest(KEY).hex() == (
        "c992db23d6290c70ffcc02f7abeb00b9d00fa8b43e55d7949c28ba6be7545d32"
        "53882a61bd004a236ef1cdba01b27ba0aedfb08eefdbfb7c19657c880b43ddf1")


def test_circomlib_master_vector():
    sk = bjj.PrivateKey(KEY)
    assert sk.scalar_key() == (
        6466070937662820620902051049739362987537906109895538826186780010858059362905)
    pk = sk.public()
    assert pk.x == 0x1d5ac1f31407018b7d413a4f52c8f74463b30e6ac2238220ad8b254de4eaa3a2
    assert pk.y == 0x1e1de8a908826c3f9ac2e0ceee929ecd0caf3b99b3ef24523aaab796a6f733c4
    sig = sk.sign(MSG)
    assert sig.r_b8.x == 0x192b4e51adf302c8139d356d0e08e2404b5ace440ef41fc78f5c4f2428df0765
    assert sig.r_b8.y == 0x2202bebcf57b820863e0acc88970b6ca7d987a0d513c2ddeb42e3f5d31b4eddf
    assert sig.s == (
        1672775540645840396591609181675628451599263765380031905495115170613215233181)
    assert bjj.verify(pk, sig, MSG)


def test_sign_verify_roundtrip():
    sk = bjj.new_key()
    pk = sk.public()
    for msg in (5, 123456789012345678901234567890):
        sig = sk.sign(msg)
        assert bjj.verify(pk, sig, msg)
        assert not bjj.verify(pk, sig, msg + 1)
        assert not bjj.verify(pk, bjj.Signature(sig.r_b8, sig.s + 1), msg)


def test_msg_range_checks():
    sk = bjj.PrivateKey(KEY)
    pk = sk.public()
    # reference uses > (not >=): msg == Q passes and wraps (lib.rs:309)
    sig = sk.sign(H.Q)
    assert bjj.verify(pk, sig, H.Q)
    with pytest.raises(ValueError):
        sk.sign(H.Q + 1)
    assert bjj.verify(pk, sig, H.Q + 1) is False


def test_signature_compress_roundtrip():
    sk = bjj.PrivateKey(KEY)
    pk = sk.public()
    for i in range(3):
        msg = int("123456" + str(i))
        sig = sk.sign(msg)
        wire = sig.compress()
        assert len(wire) == 64
        sig2 = bjj.decompress_signature(wire)
        assert sig2.r_b8.equals(sig.r_b8) and sig2.s == sig.s
        assert bjj.verify(pk, sig2, msg)


def test_schnorr_roundtrip():
    sk = bjj.new_key()
    pk = sk.public()
    msg = 123456789012345678901234567890
    r, s = sk.sign_schnorr(msg)
    assert bjj.verify_schnorr(pk, msg, r, s)
    assert not bjj.verify_schnorr(pk, msg + 1, r, s)
    assert not bjj.verify_schnorr(pk, msg, r, s + 1)


def test_import_key_validation():
    with pytest.raises(ValueError):
        bjj.PrivateKey(b"\x00" * 31)
    with pytest.raises(ValueError):
        bjj.PrivateKey(b"\x00" * 33)


def test_batch_pipelines():
    ks = [keys.new_key_bytes() for _ in range(4)]
    msgs = [5, 7, 11, 13]
    pks = eddsa.public_batch(ks)
    sigs = eddsa.sign_batch(ks, msgs)
    assert eddsa.verify_batch(pks, sigs, msgs) == [True] * 4
    bad = [(r, s + 1) for r, s in sigs]
    assert eddsa.verify_batch(pks, bad, msgs) == [False] * 4
    # cross-lane shuffle fails
    assert eddsa.verify_batch(pks, sigs[::-1], msgs) == [False, False, False, False]


def test_batch_schnorr():
    ks = [keys.new_key_bytes() for _ in range(3)]
    msgs = [1, 2, 3]
    sigs = schnorr.sign_schnorr_batch(ks, msgs)
    pks = eddsa.public_batch(ks)
    rs = [r for r, _ in sigs]
    ss = [s for _, s in sigs]
    assert schnorr.verify_schnorr_batch(pks, msgs, rs, ss) == [True] * 3
    assert schnorr.verify_schnorr_batch(pks, [m + 1 for m in msgs], rs, ss) == [False] * 3


def test_point_projective_api():
    """Reference PointProjective parity (lib.rs:62-147, tests 420-499)."""
    P2 = bjj.Point(
        17777552123799933955779906779655732241715742912184938656739573121738514868268,
        2626589144620713026669568689430873010625803728049924121243784502389097019475)
    Q2 = bjj.Point(
        16540640123574156134436876038791482806971768689494387082833631921987005038935,
        20819045374670962167435360035096875258406992893633759881276124905556507972311)
    r = P2.projective().add(P2.projective()).affine()
    assert (r.x, r.y) == (
        6890855772600357754907169075114257697580319025794532037257385534741338397365,
        4338620300185947561074059802482547481416142213883829469920100239455078257889)
    r = P2.projective().add(Q2.projective()).affine()
    assert (r.x, r.y) == (
        7916061937171219682591368294088513039687205273691143098332585753343424131937,
        14035240266687799601661095864649209771790948434046947201833777492504781204499)
    # z == 0 -> (0, 0) quirk (lib.rs:70-76)
    assert bjj.PointProjective(5, 7, 0).affine().equals(bjj.Point(0, 0))


def test_test_bit():
    # LSB-first bit indexing over LE bytes (reference lib.rs:188-190)
    b = (0b10110001).to_bytes(1, "little") + b"\x01"
    assert [bjj.test_bit(b, i) for i in range(9)] == [
        True, False, False, False, True, True, False, True, True]


def test_verify_compressed_batch():
    """Wire-format pipeline: bytes in -> bool out, invalid lanes isolated."""
    import secrets
    ks = [keys.new_key_bytes() for _ in range(3)]
    msgs = [secrets.randbelow(H.Q) for _ in range(3)]
    pks = eddsa.public_batch(ks)
    sigs = eddsa.sign_batch(ks, msgs)
    pk_b = [bjj.Point(*p).compress() for p in pks]
    sig_b = [bjj.Signature(bjj.Point(*r), s).compress() for (r, s) in sigs]
    assert eddsa.verify_compressed_batch(pk_b, sig_b, msgs) == [True] * 3
    bad = bytearray(sig_b[1])
    bad[5] ^= 0x01
    assert eddsa.verify_compressed_batch(pk_b, [sig_b[0], bytes(bad),
                                                sig_b[2]], msgs) == \
        [True, False, True]
    bad_pk = (H.Q).to_bytes(32, "little")  # y >= Q: invalid encoding
    assert eddsa.verify_compressed_batch([bad_pk, pk_b[1], pk_b[2]], sig_b,
                                         msgs) == [False, True, True]


def test_sign_compressed_batch_bytes_parity():
    """Batch wire-format sign/pubkey match the per-item compressors
    (reference Signature::compress lib.rs:246-258, Point::compress
    lib.rs:166-178) byte-for-byte, and round-trip the wire verify."""
    from babyjubjub_tpu.utils import codec

    ks = [bytes([i + 1] * 32) for i in range(3)]
    msgs = [5, 6, H.Q]  # include the msg == Q wrap lane
    sigs = eddsa.sign_batch(ks, msgs)
    wire = eddsa.sign_compressed_batch(ks, msgs)
    assert [len(w) for w in wire] == [64] * 3
    for (r, s), w in zip(sigs, wire):
        assert w == codec.compress_signature(r, s)
    pk_wire = eddsa.public_compressed_batch(ks)
    for p, pb in zip(eddsa.public_batch(ks), pk_wire):
        assert pb == codec.compress_point(p)
    assert eddsa.verify_compressed_batch(pk_wire, wire, msgs) == [True] * 3


def test_sign_compressed_batch_msg_range():
    with pytest.raises(ValueError):
        eddsa.sign_compressed_batch([KEY], [H.Q + 1])
