"""13-bit-limb fast-path emitters vs python-int ground truth.

The emitters are pure jnp code (the pallas kernels wrap them), so the
field/point algebra is fully testable on the CPU backend; the fused
ladder kernel itself is exercised on real TPU (see bench.py) and through
curve.scalar_mul_windowed's pallas route.
"""

import secrets

import numpy as np
import jax.numpy as jnp
import pytest

from babyjubjub_tpu.ops import field as F
from babyjubjub_tpu.ops.pallas import fast13 as FK
from babyjubjub_tpu.utils import hostmath as H

P = H.Q
B = 8


def _enc13(vals):
    return [jnp.asarray(v) for v in FK.ints_to_array13(list(vals))]


def _enc13_mont(vals):
    return _enc13([v * FK.R13 % P for v in vals])


def _dec13(limbs):
    return FK.array13_to_ints(np.stack([np.asarray(v) for v in limbs]))


@pytest.fixture(scope="module")
def rand_pairs():
    xs = [secrets.randbelow(P) for _ in range(B - 2)] + [0, P - 1]
    ys = [secrets.randbelow(P) for _ in range(B - 2)] + [P - 1, P - 1]
    return xs, ys


def test_structure_constants():
    # the whole design hinges on these
    assert FK.P13[0] == 1 and FK.P13[1] == 0
    assert sum(v << (13 * k) for k, v in enumerate(FK.P13)) == P


def test_mul_sq_13(rand_pairs):
    xs, ys = rand_pairs
    ax, ay = _enc13_mont(xs), _enc13_mont(ys)
    got = _dec13(FK.emit_cond_sub13(FK.emit_mul13(ax, ay)))
    assert got == [(x * y * FK.R13) % P for x, y in zip(xs, ys)]
    got = _dec13(FK.emit_cond_sub13(FK.emit_sq13(ax)))
    assert got == [(x * x * FK.R13) % P for x in xs]


def test_add_sub_13(rand_pairs):
    xs, ys = rand_pairs
    ax, ay = _enc13_mont(xs), _enc13_mont(ys)
    got = _dec13(FK.emit_add13(ax, ay))
    assert all(g % P == (x + y) * FK.R13 % P for g, x, y in zip(got, xs, ys))
    got = _dec13(FK.emit_sub13(ax, ay))
    assert all(g % P == (x - y) * FK.R13 % P for g, x, y in zip(got, xs, ys))


def test_mul_small_13(rand_pairs):
    xs, _ = rand_pairs
    # lazy inputs up to ~8p (the formulas feed it mul outputs < 2p, but
    # keep margin), constants = the curve coefficients and edge sizes
    lazy = [x + 3 * P for x in xs[:4]] + xs[4:]
    ax = _enc13(lazy)
    for c in (H.A_COEFF, H.D_COEFF, 1, (1 << 26) - 1):
        got = _dec13(FK.emit_mul_small13(c, ax))
        assert all(g < 3 * P and g % P == (c * v) % P
                   for g, v in zip(got, lazy)), c


def test_repack_and_shift(rand_pairs):
    xs, _ = rand_pairs
    v16 = [jnp.asarray(r) for r in F.ints_to_array(xs)]
    l13 = FK.emit_repack_16to13(v16)
    assert _dec13(l13) == xs
    b16 = F.array_to_ints(np.stack([np.asarray(v) for v in
                                    FK.emit_repack_13to16(l13)]))
    assert b16 == xs
    assert _dec13(FK.emit_shl4_13(l13)) == [x << 4 for x in xs]


def test_x5_and_mds_row_13(rand_pairs):
    import jax.numpy as jnp_
    from babyjubjub_tpu.ops import grain
    xs, _ = rand_pairs
    ax = _enc13_mont(xs)
    got = _dec13(FK.emit_x5_13(ax))
    assert all(g % P == pow(x, 5, P) * FK.R13 % P for g, x in zip(got, xs))

    # one t=6 MDS row against integer math (values < 3p lazy inputs)
    _, m = grain.poseidon_params(6)
    svals = [[secrets.randbelow(2 * P) for _ in range(B)] for _ in range(6)]
    svecs = [_enc13(v) for v in svals]
    mrow = [[jnp_.uint32(int(l)) for l in FK.int_to_limbs13(m[0][j] * FK.R13 % P)]
            for j in range(6)]
    got = _dec13(FK.emit_mds_row13(mrow, svecs))
    rinv = pow(FK.R13, -1, P)
    for i in range(B):
        want = sum(m[0][j] * FK.R13 % P * svals[j][i] for j in range(6))
        assert got[i] % P == want * rinv % P


def test_twist_extended_ops_13():
    """a=-1 twist formulas (ladder/comb fast path) vs host ground truth."""
    rinv = pow(FK.R13, -1, P)
    s_tw = FK._S_TWIST
    pts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER)) for _ in range(B)]
    qts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER)) for _ in range(B)]
    one = [jnp.full((B,), int(v), jnp.uint32) for v in FK.ONE_M13]

    def to_ext(ps):
        xt = [p[0] * s_tw % P for p in ps]
        y = [p[1] for p in ps]
        t = [x * yy % P for x, yy in zip(xt, y)]
        return (_enc13_mont(xt), _enc13_mont(y), one, _enc13_mont(t))

    def untwist_affine(ext):
        xi, yi, zi = (_dec13(ext[c]) for c in range(3))
        out = []
        sinv = pow(s_tw, -1, P)
        for i in range(B):
            z = zi[i] * rinv % P
            zin = pow(z, P - 2, P)
            out.append((xi[i] * rinv * zin * sinv % P,
                        yi[i] * rinv * zin % P))
        return out

    pp, qq = to_ext(pts), to_ext(qts)
    got = untwist_affine(FK.emit_dblE13(pp, want_t=True))
    assert got == [H.point_add(p, p) for p in pts]
    ent = FK._entry_from_point13(qq)
    got = untwist_affine(FK.emit_addE13(pp, ent, want_t=True))
    assert got == [H.point_add(p, q) for p, q in zip(pts, qts)]
    # completeness: P + P and P + identity through the same unified add
    got = untwist_affine(FK.emit_addE13(pp, FK._entry_from_point13(pp),
                                        want_t=False))
    assert got == [H.point_add(p, p) for p in pts]
    zero = [jnp.zeros_like(one[0]) for _ in range(FK.N)]
    ident_ent = (one, one, zero, one)
    got = untwist_affine(FK.emit_addE13(pp, ident_ent, want_t=False))
    assert got == pts


def test_point_ops_13():
    rinv = pow(FK.R13, -1, P)
    pts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER)) for _ in range(B)]
    qts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER)) for _ in range(B)]
    one = [jnp.full((B,), int(v), jnp.uint32) for v in FK.ONE_M13]
    pp = (_enc13_mont([p[0] for p in pts]), _enc13_mont([p[1] for p in pts]),
          one)
    qq = (_enc13_mont([q[0] for q in qts]), _enc13_mont([q[1] for q in qts]),
          one)

    def affine(proj):
        xi, yi, zi = (_dec13(c) for c in proj)
        out = []
        for i in range(B):
            z = zi[i] * rinv % P
            zin = pow(z, P - 2, P)
            out.append((xi[i] * rinv * zin % P, yi[i] * rinv * zin % P))
        return out

    got = affine(FK.emit_point_add13(pp, qq))
    assert got == [H.point_add(p, q) for p, q in zip(pts, qts)]
    got = affine(FK.emit_point_double13(pp))
    assert got == [H.point_add(p, p) for p in pts]
    # unified add doubles correctly too (reference add handles P == Q)
    got = affine(FK.emit_point_add13(pp, pp))
    assert got == [H.point_add(p, p) for p in pts]
