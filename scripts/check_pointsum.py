"""On-chip exactness check of pallas/point.point_sum (grid accumulation
+ lane-roll butterfly fold) against the host BigInt model, plus the
tree_reduce_points routing and a quick ladder-MSM exactness pass."""

import os
import random
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from babyjubjub_tpu.models import msm as M
from babyjubjub_tpu.ops import field as F, curve as C
from babyjubjub_tpu.ops.pallas import point as PK
from babyjubjub_tpu.utils import hostmath as H

rng = random.Random(0x505)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

pts = [H.mul_scalar(H.B8, rng.randrange(1, H.SUBORDER)) for _ in range(B)]
x, y = map(jax.device_put, C.points_to_arrays(pts))
one = jax.device_put(np.asarray(F.fq().one_mont((B,))))

sx, sy, sz = jax.jit(PK.point_sum)(x, y, one)
got = C.arrays_to_points(jax.jit(C.to_affine)(
    (sx[:, :1], sy[:, :1], sz[:, :1])))[0]
want = H.IDENTITY
for p in pts:
    want = H.point_add(want, p)
print("point_sum exact:", got == want, flush=True)
assert got == want

# every lane must hold the same total after the butterfly
aff_all = C.arrays_to_points(jax.jit(C.to_affine)((sx, sy, sz)))
assert all(a == want for a in aff_all), "lanes disagree after fold"
print("all lanes agree", flush=True)

# full MSM through the public API (ladder engine + new reduce)
scalars = [0, 1, H.ORDER - 1] + [rng.randrange(H.ORDER)
                                 for _ in range(B - 3)]
got_msm = M.msm(pts, scalars)
acc = H.IDENTITY
for p, n in zip(pts, scalars):
    acc = H.point_add(acc, H.mul_scalar(p, n % H.ORDER))
print("msm exact:", got_msm == acc, flush=True)
assert got_msm == acc
print("OK", flush=True)
