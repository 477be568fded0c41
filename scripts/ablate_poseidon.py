"""Poseidon t=6 ablation: sbox multiplier (Karatsuba vs schoolbook) x
tile (1024 vs 2048), MXU MDS mode. Karatsuba regressed the full bench
(3.03 -> 2.72 M hashes/s) — suspicion: vreg pressure at tile 2048."""

import os
import secrets
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from babyjubjub_tpu.ops import field as F
from babyjubjub_tpu.ops.pallas import fast13 as FK
from babyjubjub_tpu.utils import hostmath as H, timing

B = 8192
sa = jax.device_put(F.ints_to_array(
    [secrets.randbelow(H.Q) for _ in range(B)]))
st = jax.device_put(jnp.stack([sa] * 5, axis=1))  # (16, 5, B)

kara = (FK.emit_mul13, FK.emit_sq13)
school = (FK.emit_mul13_schoolbook, FK.emit_sq13_schoolbook)

for mname, (m, s) in (("kara", kara), ("school", school)):
    FK.emit_mul13, FK.emit_sq13 = m, s
    jax.clear_caches()
    for tile in (1024, 2048):
        def step(x, tile=tile):
            h = FK.poseidon_fused13(x, tile=tile, mode="mxu")
            return x.at[:, 0].set(h)
        dt = timing.chain_timer(step, st, 1, None)
        print(f"poseidon t=6 mxu {mname} tile={tile}: "
              f"{B / dt:,.0f} hashes/s", flush=True)

FK.emit_mul13, FK.emit_sq13 = kara
