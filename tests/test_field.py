"""Field-arithmetic property tests vs exact python-int ground truth.

Mirrors the reference's utils tests (/root/reference/src/utils.rs:225-261)
plus batched property coverage the reference lacks.
"""

import random

import jax
import numpy as np
import pytest

from babyjubjub_tpu.ops import field as F
from babyjubjub_tpu.utils import hostmath as H


@pytest.fixture(scope="module")
def fq():
    return F.fq()


def _mont_array(spec, xs):
    return F.ints_to_array([spec.to_mont_int(x) for x in xs])


def _from_mont(spec, arr):
    return [spec.from_mont_int(v) for v in F.array_to_ints(arr)]


RNG = random.Random(0xBABE)
XS = [RNG.randrange(H.Q) for _ in range(48)] + [0, 1, 2, H.Q - 1, H.Q - 2, H.Q >> 1]
YS = [RNG.randrange(H.Q) for _ in range(48)] + [1, 0, H.Q - 1, H.Q - 1, 2, 3]


def test_limb_codec_roundtrip():
    for x in XS:
        assert F.limbs_to_int(F.int_to_limbs(x)) == x


def test_add_sub_mul(fq):
    ax, ay = _mont_array(fq.spec, XS), _mont_array(fq.spec, YS)
    assert _from_mont(fq.spec, jax.jit(fq.add)(ax, ay)) == [(x + y) % H.Q for x, y in zip(XS, YS)]
    assert _from_mont(fq.spec, jax.jit(fq.sub)(ax, ay)) == [(x - y) % H.Q for x, y in zip(XS, YS)]
    assert _from_mont(fq.spec, jax.jit(fq.mul)(ax, ay)) == [(x * y) % H.Q for x, y in zip(XS, YS)]
    assert _from_mont(fq.spec, jax.jit(fq.neg)(ax)) == [(-x) % H.Q for x in XS]


def test_inv(fq):
    xs = [x for x in XS if x != 0]
    ax = _mont_array(fq.spec, xs)
    got = _from_mont(fq.spec, jax.jit(fq.inv)(ax))
    # parity with reference modinv (utils.rs:11-29)
    assert got == [H.modinv(x, H.Q) for x in xs]


def test_inv_zero_is_zero(fq):
    ax = _mont_array(fq.spec, [0])
    assert _from_mont(fq.spec, jax.jit(fq.inv)(ax)) == [0]


def test_mont_roundtrip_accepts_uncanonical(fq):
    big = [H.Q + RNG.randrange(H.Q) for _ in range(8)] + [F.FQ_SPEC.R - 1]
    ab = F.ints_to_array(big)
    back = F.array_to_ints(jax.jit(fq.from_mont)(jax.jit(fq.to_mont)(ab)))
    assert back == [b % H.Q for b in big]


def test_gt_half_p(fq):
    vals = [0, 1, H.Q >> 1, (H.Q >> 1) + 1, H.Q - 1]
    got = np.asarray(jax.jit(fq.gt_half_p)(F.ints_to_array(vals)))
    assert list(got) == [v > (H.Q >> 1) for v in vals]


def test_scalar_field_mul():
    fl = F.fl()
    l = H.SUBORDER
    xs = [RNG.randrange(l) for _ in range(16)]
    ys = [RNG.randrange(l) for _ in range(16)]
    ax = _mont_array(fl.spec, xs)
    ay = _mont_array(fl.spec, ys)
    assert _from_mont(fl.spec, jax.jit(fl.mul)(ax, ay)) == [(x * y) % l for x, y in zip(xs, ys)]


def test_order_ring_add():
    fo = F.fo()  # even modulus: additive ring only
    xs = [RNG.randrange(H.ORDER) for _ in range(16)]
    ax = F.ints_to_array(xs)
    got = F.array_to_ints(jax.jit(fo.add)(ax, ax))
    assert got == [(2 * x) % H.ORDER for x in xs]


def test_hostmath_reference_parity():
    # reference utils.rs:229-237 (adapted: the reference vector's modulus)
    a = 123456789123456789123456789123456789123456789
    b = 12345678
    assert H.modinv(a, b) == 641883
    # reference utils.rs:239-260
    a = 6536923810004159332831702809452452174451353762940761092345538667656658715568
    q = 7237005577332262213973186563042994240857116359379907606001950938285454250989
    assert H.modsqrt(a, q) == 5464794816676661649783249706827271879994893912039750480019443499440603127256
    with pytest.raises(ValueError):
        H.modinv(0, H.Q)
