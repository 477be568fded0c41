"""Curve-op golden tests: circomlib vectors from the reference test suite.

Vectors: /root/reference/src/lib.rs:420-552 (test_add_same_point,
test_add_different_points, test_mul_scalar).
"""

import random

import jax
import numpy as np
import pytest

from babyjubjub_tpu.ops import field as F, curve as C
from babyjubjub_tpu.utils import hostmath as H

P = (17777552123799933955779906779655732241715742912184938656739573121738514868268,
     2626589144620713026669568689430873010625803728049924121243784502389097019475)
Q2 = (16540640123574156134436876038791482806971768689494387082833631921987005038935,
      20819045374670962167435360035096875258406992893633759881276124905556507972311)
N_BIG = 14035240266687799601661095864649209771790948434046947201833777492504781204499

ADD_SAME = (6890855772600357754907169075114257697580319025794532037257385534741338397365,
            4338620300185947561074059802482547481416142213883829469920100239455078257889)
ADD_DIFF = (7916061937171219682591368294088513039687205273691143098332585753343424131937,
            14035240266687799601661095864649209771790948434046947201833777492504781204499)
MUL3 = (19372461775513343691590086534037741906533799473648040012278229434133483800898,
        9458658722007214007257525444427903161243386465067105737478306991484593958249)
MULBIG = (17070357974431721403481313912716834497662307308519659060910483826664480189605,
          4014745322800118607127020275658861516666525056516280575712425373174125159339)


def test_host_golden():
    assert H.point_add(P, P) == ADD_SAME
    assert H.point_add(P, Q2) == ADD_DIFF
    assert H.mul_scalar(P, 3) == MUL3
    assert H.mul_scalar(P, N_BIG) == MULBIG
    assert H.is_on_curve(P) and H.is_on_curve(Q2) and H.is_on_curve(H.B8)


def test_device_add_golden():
    pts = [P, Q2, P, H.IDENTITY, P]
    qts = [P, P, Q2, P, H.IDENTITY]
    pa, qa = C.points_to_arrays(pts), C.points_to_arrays(qts)
    f = jax.jit(lambda p, q: C.to_affine(C.add(C.to_projective(p), C.to_projective(q))))
    got = C.arrays_to_points(f(pa, qa))
    assert got == [H.point_add(a, b) for a, b in zip(pts, qts)]
    assert got[0] == ADD_SAME and got[1] == ADD_DIFF


def test_device_double_matches_add():
    pts = [P, Q2, H.B8, H.IDENTITY]
    pa = C.points_to_arrays(pts)
    f = jax.jit(lambda p: C.to_affine(C.double(C.to_projective(p))))
    assert C.arrays_to_points(f(pa)) == [H.point_add(a, a) for a in pts]


SCALARS = [0, 1, 2, 3, 7, N_BIG, H.SUBORDER - 1, H.ORDER - 1,
           random.Random(7).randrange(1 << 254)]


@pytest.mark.parametrize("fn", [C.scalar_mul, C.scalar_mul_windowed_affine],
                         ids=["ladder", "windowed"])
def test_device_scalar_mul(fn):
    sa = F.ints_to_array(SCALARS)
    ba = C.points_to_arrays([P] * len(SCALARS))
    got = C.arrays_to_points(jax.jit(fn)(ba, sa))
    want = [H.mul_scalar(P, s) for s in SCALARS]
    assert got == want
    assert got[3] == MUL3 and got[5] == MULBIG


def test_fixed_base_mul():
    sa = F.ints_to_array(SCALARS)
    got = C.arrays_to_points(jax.jit(C.fixed_base_mul_affine)(sa))
    assert got == [H.mul_scalar(H.B8, s) for s in SCALARS]


def test_reduce_full_mod_order():
    """Full 256-bit -> mod-ORDER reduction (5 conditional subtractions),
    the same algorithm the fused sw13 kernel runs in-register before its
    Booth recode; validated here on the device ring over the full input
    range incl. the k*ORDER boundaries."""
    rng = random.Random(11)
    vals = [0, 1, H.ORDER - 1, H.ORDER, H.ORDER + 1, 5 * H.ORDER,
            (1 << 256) - 1] + [rng.randrange(1 << 256) for _ in range(16)]
    got = F.array_to_ints(np.asarray(
        jax.jit(F.fo().reduce_full)(F.ints_to_array(vals))))
    assert got == [v % H.ORDER for v in vals]


def test_scalar_mul_bit255_group_exact():
    """Scalars with bit 255 set: true s*P == (s mod ORDER)*P on curve
    points, so the fused route's device-side reduction (the guard for the
    Booth recode's s < 2^255 precondition) is exact."""
    rng = random.Random(13)
    ss = [(1 << 255) | rng.randrange(1 << 255) for _ in range(4)]
    sa = F.ints_to_array(ss)
    ba = C.points_to_arrays([P] * len(ss))
    got = C.arrays_to_points(jax.jit(C.scalar_mul_windowed_affine)(ba, sa))
    assert got == [H.mul_scalar(P, s % H.ORDER) for s in ss]
    assert got == [H.mul_scalar(P, s) for s in ss]


def test_points_equal():
    pa = C.points_to_arrays([P, P, Q2])
    qa = C.points_to_arrays([P, Q2, Q2])
    got = np.asarray(jax.jit(C.points_equal)(pa, qa))
    assert list(got) == [True, False, True]
