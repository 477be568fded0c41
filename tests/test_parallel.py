"""Sharded pipeline tests on the virtual 8-device CPU mesh.

The reference has no distribution at all (SURVEY.md section 2.3); these
tests pin the mesh/shard_map/collective paths: data-parallel verify and
scalar-mul, window-parallel fixed-base comb, and the MSM partial-sum
combine.
"""

import secrets

import jax
import numpy as np
import pytest

from babyjubjub_tpu.ops import field as F, curve as C
from babyjubjub_tpu.models import eddsa, keys, msm as msm_mod
from babyjubjub_tpu.parallel import mesh as M, sharded as S
from babyjubjub_tpu.utils import hostmath as H

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh2d():
    return M.make_mesh(8, win=2)


@pytest.fixture(scope="module")
def mesh1d():
    return M.make_mesh(8)


def test_verify_sharded(mesh1d):
    b = 16
    ks = [keys.new_key_bytes() for _ in range(b)]
    msgs = [secrets.randbelow(H.Q) for _ in range(b)]
    pks = eddsa.public_batch(ks)
    sigs = eddsa.sign_batch(ks, msgs)
    ax, ay = C.points_to_arrays(pks)
    rx, ry = C.points_to_arrays([s[0] for s in sigs])
    ss = F.ints_to_array([s[1] for s in sigs])
    ms = F.ints_to_array([m % H.Q for m in msgs])
    ok = np.asarray(S.verify_sharded(mesh1d)(rx, ry, ax, ay, ss, ms))
    assert ok.all()
    bad = F.ints_to_array([(s[1] + 1) % H.SUBORDER for s in sigs])
    ok2 = np.asarray(S.verify_sharded(mesh1d)(rx, ry, ax, ay, bad, ms))
    assert not ok2.any()


def test_scalar_mul_sharded(mesh1d):
    b = 8
    pts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER)) for _ in range(b)]
    ns = [secrets.randbelow(H.SUBORDER) for _ in range(b)]
    px, py = C.points_to_arrays(pts)
    sa = F.ints_to_array(ns)
    ox, oy = S.scalar_mul_sharded(mesh1d)(px, py, sa)
    got = C.arrays_to_points((ox, oy))
    assert got == [H.mul_scalar(p, n) for p, n in zip(pts, ns)]


def test_fixed_base_win_sharded(mesh2d):
    b = 8
    ns = [secrets.randbelow(H.SUBORDER) for _ in range(b)]
    sa = F.ints_to_array(ns)
    ox, oy = S.fixed_base_win_sharded(mesh2d)(sa)
    got = C.arrays_to_points((ox, oy))
    assert got == [H.mul_scalar(H.B8, n) for n in ns]


def test_msm_sharded_matches_host(mesh1d):
    b = 16
    pts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER)) for _ in range(b)]
    ns = [secrets.randbelow(H.SUBORDER) for _ in range(b)]
    px, py = C.points_to_arrays(pts)
    sa = F.ints_to_array(ns)
    ox, oy, oz = S.msm_sharded(mesh1d)(px, py, sa)
    (x, y), = C.arrays_to_points(jax.jit(C.to_affine)((ox, oy, oz)))
    want = H.IDENTITY
    for p, n in zip(pts, ns):
        want = H.point_add(want, H.mul_scalar(p, n))
    assert (x, y) == want


def test_msm_host_api():
    pts = [H.mul_scalar(H.B8, k + 1) for k in range(5)]
    ns = [3, 1, 4, 1, 5]
    got = msm_mod.msm(pts, ns)
    want = H.IDENTITY
    for p, n in zip(pts, ns):
        want = H.point_add(want, H.mul_scalar(p, n))
    assert got == want
