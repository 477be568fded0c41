"""Ablation: Pippenger (sort + scan buckets) vs batched-ladder MSM on TPU.

Usage: python scripts/ablate_msm.py [B ...]   (default 16384 65536)
"""

import os
import secrets
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from babyjubjub_tpu.models import msm as M
from babyjubjub_tpu.ops import field as F, curve as C
from babyjubjub_tpu.utils import hostmath as H, timing

sizes = [int(a) for a in sys.argv[1:]] or [16384, 65536]

for B in sizes:
    base_pts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER))
                for _ in range(8)]
    pts = (base_pts * (B // 8 + 1))[:B]
    bx, by = map(jax.device_put, C.points_to_arrays(pts))
    sa = jax.device_put(F.ints_to_array(
        [secrets.randbelow(H.SUBORDER) for _ in range(B)]))

    # exactness cross-check: engines agree
    aff_pip = jax.jit(C.to_affine)(M._msm_pip_jit((bx, by), sa))
    aff_lad = jax.jit(C.to_affine)(M._msm_lad_jit((bx, by), sa))
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(aff_pip, aff_lad)), f"engines disagree B={B}"
    print(f"B={B}: engines agree", flush=True)

    for name, eng in (("pippenger", M._msm_pip_jit),
                      ("ladder", M._msm_lad_jit)):
        def step(s, eng=eng):
            px, py, pz = eng((bx, by), s)
            return (s ^ px) & 0xFFFF
        dt = timing.chain_timer(step, sa, 1, None)
        print(f"B={B} {name}: {dt*1e3:8.2f} ms/msm = "
              f"{B / dt:,.0f} point-muls/s", flush=True)
