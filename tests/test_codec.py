"""Point compression/decompression golden tests.

Sources: reference lib.rs:575-654 (test_point_compress_decompress,
test_point_decompress0/1, test_point_decompress_loop).
"""

import secrets

import jax
import numpy as np
import pytest

import babyjubjub_tpu as bjj
from babyjubjub_tpu.ops import field as F, codec_dev
from babyjubjub_tpu.utils import codec, hostmath as H

P = (17777552123799933955779906779655732241715742912184938656739573121738514868268,
     2626589144620713026669568689430873010625803728049924121243784502389097019475)


def test_point_compress_golden():
    p = bjj.Point(*P)
    comp = p.compress()
    assert comp.hex() == "53b81ed5bffe9545b54016234682e7b2f699bd42a5e9eae27ff4051bc698ce85"
    p2 = bjj.decompress_point(comp)
    assert p2.equals(p)


def test_point_decompress0():
    y_bytes = bytes.fromhex(
        "b5328f8791d48f20bec6e481d91c7ada235f1facf22547901c18656b6c3e042f")
    p = bjj.decompress_point(y_bytes)
    expected_px = int.from_bytes(bytes.fromhex(
        "b86cc8d9c97daef0afe1a4753c54fb2d8a530dc74c7eee4e72b3fdf2496d2113"),
        "little")
    assert p.x == expected_px


def test_point_decompress1():
    y_bytes = bytes.fromhex(
        "70552d3ff548e09266ded29b33ce75139672b062b02aa66bb0d9247ffecf1d0b")
    p = bjj.decompress_point(y_bytes)
    expected_px = int.from_bytes(bytes.fromhex(
        "30f1635ba7d56f9cb32c3ffbe6dca508a68c7f43936af11a23c785ce98cb3404"),
        "little")
    assert p.x == expected_px


def test_decompress_rejects_bad_y():
    bad = bytearray(int(H.Q).to_bytes(32, "little"))
    with pytest.raises(ValueError):
        bjj.decompress_point(bytes(bad))


def test_device_batch_roundtrip():
    # random subgroup points -> compress -> device decompress -> equal
    pts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER)) for _ in range(6)]
    rows = np.stack([np.frombuffer(codec.compress_point(p), dtype=np.uint8)
                     for p in pts])
    y_limbs, sign = codec.split_compressed_batch(rows)
    xm, ym, valid = jax.jit(codec_dev.decompress)(
        jnp_arr(y_limbs), jnp_arr(sign))
    assert all(np.asarray(valid))
    xs = [F.FQ_SPEC.from_mont_int(v) for v in F.array_to_ints(xm)]
    ys = [F.FQ_SPEC.from_mont_int(v) for v in F.array_to_ints(ym)]
    assert list(zip(xs, ys)) == pts
    # device compress roundtrip
    yc, sg = jax.jit(codec_dev.compress)(xm, ym)
    rows2 = codec.assemble_compressed_batch(np.asarray(yc), np.asarray(sg))
    assert (rows2 == rows).all()


def test_device_batch_invalid_lane():
    # a y with no valid x should flag invalid, matching reference Err
    good = codec.compress_point(H.mul_scalar(H.B8, 12345))
    bad = None
    y = 1
    while bad is None:
        try:
            codec.decompress_point(int(y).to_bytes(32, "little"))
        except ValueError:
            bad = int(y).to_bytes(32, "little")
        y += 1
    rows = np.stack([np.frombuffer(good, dtype=np.uint8),
                     np.frombuffer(bad, dtype=np.uint8)])
    y_limbs, sign = codec.split_compressed_batch(rows)
    _, _, valid = jax.jit(codec_dev.decompress)(jnp_arr(y_limbs), jnp_arr(sign))
    assert list(np.asarray(valid)) == [True, False]


def jnp_arr(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


def test_decompress_pair_matches_single():
    """decompress_pair (shared-inversion wire path) must be lane-exact vs
    two plain decompress() calls, including invalid lanes: bad y-range,
    non-residue x^2, and the x == 0 identity-point rejection."""
    pts = [H.mul_scalar(H.B8, 7 + 13 * i) for i in range(4)]
    good_rows = [np.frombuffer(codec.compress_point(p), dtype=np.uint8)
                 for p in pts]
    # y >= Q lane and a non-residue lane
    bad_y = np.frombuffer(int(H.Q).to_bytes(32, "little"), dtype=np.uint8)
    y = 1
    while True:
        try:
            codec.decompress_point(int(y).to_bytes(32, "little"))
        except ValueError:
            break
        y += 1
    bad_x2 = np.frombuffer(int(y).to_bytes(32, "little"), dtype=np.uint8)
    # x == 0: y = 1 encodes the identity, rejected via the x^2 == 0 rule
    ident = np.frombuffer(int(1).to_bytes(32, "little"), dtype=np.uint8)

    rows_a = np.stack([good_rows[0], bad_y, good_rows[1], ident])
    rows_b = np.stack([bad_x2, good_rows[2], good_rows[3], good_rows[0]])
    ya, sa = codec.split_compressed_batch(rows_a)
    yb, sb = codec.split_compressed_batch(rows_b)
    ya, sa, yb, sb = map(jnp_arr, (ya, sa, yb, sb))

    (xa, yam, va), (xb, ybm, vb) = jax.jit(codec_dev.decompress_pair)(
        ya, sa, yb, sb)
    xa1, ya1, va1 = jax.jit(codec_dev.decompress)(ya, sa)
    xb1, yb1, vb1 = jax.jit(codec_dev.decompress)(yb, sb)

    assert list(np.asarray(va)) == list(np.asarray(va1)) == [True, False,
                                                             True, False]
    assert list(np.asarray(vb)) == list(np.asarray(vb1)) == [False, True,
                                                             True, True]
    # x/y parity on VALID lanes only (invalid-lane coords are masked garbage)
    for got, ref, valid in ((xa, xa1, va1), (xb, xb1, vb1)):
        g, r = np.asarray(got), np.asarray(ref)
        for i in range(4):
            if np.asarray(valid)[i]:
                assert (g[:, i] == r[:, i]).all()
    assert (np.asarray(yam) == np.asarray(ya1)).all()
    assert (np.asarray(ybm) == np.asarray(yb1)).all()
