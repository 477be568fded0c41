"""Ablation: signed-window (Booth, 9-entry) vs unsigned (16-entry) ladder.

Run on the real TPU chip: exactness cross-check + chained throughput at
tile 1024 / 2048 for the signed kernel vs the round-1 tw13 baseline.
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

from babyjubjub_tpu.ops import field as F, curve as C
from babyjubjub_tpu.ops.pallas import fast13 as FK
from babyjubjub_tpu.utils import hostmath as H, timing

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

base_pts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER))
            for _ in range(8)]
pts = (base_pts * (B // 8 + 1))[:B]
bx, by = map(jax.device_put, C.points_to_arrays(pts))
sa = jax.device_put(F.ints_to_array(
    [secrets.randbelow(H.SUBORDER) for _ in range(B)]))

# exactness: sw vs tw on 512 lanes
nchk = 512
ref = jax.jit(C.to_affine)(FK.scalar_mul_fused_tw13(
    bx[:, :nchk], by[:, :nchk], sa[:, :nchk]))
for w in (4, 5):
    got = jax.jit(C.to_affine)(FK.scalar_mul_fused_sw13(
        bx[:, :nchk], by[:, :nchk], sa[:, :nchk], w=w))
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(ref, got)), f"sw13 w={w} != tw13"
    print(f"exactness OK (sw w={w} == tw on 512 lanes)", flush=True)

# w=5 ablation rationale (VERDICT r4 #3): 52 windows x (5D + 1A) ~ 312
# point-ops/lane vs w=4's 64 x (4D + 1A) = 384 (-19% ops); the Booth
# table grows 9 -> 17 entries so VMEM pressure may force a smaller tile.
for name, fn, tiles, kw in (
        ("sw13 w=4", FK.scalar_mul_fused_sw13, (512, 1024, 2048), {"w": 4}),
        ("sw13 w=5", FK.scalar_mul_fused_sw13, (512, 1024, 2048), {"w": 5}),
        ("tw13", FK.scalar_mul_fused_tw13, (1024,), {}),
):
    for tile in tiles:
        if B % tile:
            continue
        def step(s, fn=fn, tile=tile, kw=kw):
            px, py, pz = fn(bx, by, s, tile=tile, **kw)
            return (s ^ px) & 0xFFFF
        try:
            dt = timing.chain_timer(step, sa, 1, None, budget_s=60)
        except Exception as e:  # VMEM overflow etc.
            print(f"{name} tile={tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        print(f"{name} tile={tile}: {B / dt:,.0f} scalar-muls/s", flush=True)
