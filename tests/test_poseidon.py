"""Poseidon KATs (circomlib values) and device/host parity."""

import random

import jax
import numpy as np
import pytest

from babyjubjub_tpu.ops import field as F, poseidon as P
from babyjubjub_tpu.utils import hostmath as H


def test_host_circomlib_kats():
    # Widely-pinned circomlib poseidon values (t=2, t=3)
    assert P.hash_host([1]) == (
        18586133768512220936620570745912940619677854269274689475585506675881198879027)
    assert P.hash_host([1, 2]) == (
        7853200120776062878684798364095072458815029376092732009249414926327459813530)


@pytest.mark.parametrize("nin", [1, 2, 5, 16])
def test_device_matches_host(nin):
    rng = random.Random(nin)
    fq = F.fq()
    B = 3
    vals = [[rng.randrange(H.Q) for _ in range(nin)] for _ in range(B)]
    arr = np.zeros((F.NLIMB, nin, B), dtype=np.uint32)
    for b in range(B):
        for i in range(nin):
            arr[:, i, b] = F.int_to_limbs(fq.spec.to_mont_int(vals[b][i]))
    out = jax.jit(P.hash_mont)(arr)
    got = [fq.spec.from_mont_int(v) for v in F.array_to_ints(out)]
    assert got == [P.hash_host(v) for v in vals]


def test_grain_first_constant():
    # the canonical circomlib t=3 first round constant
    from babyjubjub_tpu.ops import grain
    c, m = grain.poseidon_params(3)
    assert c[0] == 0x0ee9a592ba9a9518d05986d656f40c2114c4993c11bb29938d21d47304cd8e6e
    assert len(c) == 3 * (8 + 57)
    assert len(m) == 3 and len(m[0]) == 3
