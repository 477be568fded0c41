"""Honest MSM timing without the fori-chained mega-executable.

The chained-fori methodology (utils/timing.py) wraps the whole MSM in a
lax.fori_loop; for the Pippenger graph that executable faults the axon
worker. Instead: K data-dependent host-level dispatches (scalar input
XORed with the previous result so executions serialize), one block at
the end, differenced against a single dispatch. Async enqueue means the
relay round-trip is paid once, not per call.

Usage: python scripts/msm_timing.py [B ...]
"""

import os
import secrets
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from babyjubjub_tpu.models import msm as M
from babyjubjub_tpu.ops import field as F, curve as C
from babyjubjub_tpu.utils import hostmath as H

sizes = [int(a) for a in sys.argv[1:]] or [16384, 65536]


def run_chain(eng, bx, by, sa, k):
    s = sa
    out = None
    for _ in range(k):
        out = eng((bx, by), s)
        s = (s ^ out[0]) & jnp.uint32(0xFFFF)  # (16,1) broadcasts over B
    # np.asarray (D2H copy), NOT block_until_ready: through the axon
    # relay only materialization forces real completion.
    np.asarray(out[0])
    return out


def bench_engine(name, eng, bx, by, sa, B, k=16):
    run_chain(eng, bx, by, sa, 1)            # compile + warm
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        run_chain(eng, bx, by, sa, 1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_chain(eng, bx, by, sa, k)
        tk = time.perf_counter() - t0
        dt = (tk - t1) / (k - 1)
        best = dt if best is None else min(best, dt)
    print(f"B={B} {name}: {best*1e3:8.2f} ms/msm = "
          f"{B/best:,.0f} pt-muls/s", flush=True)


for B in sizes:
    pts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER))
           for _ in range(8)] * (B // 8)
    bx, by = map(jax.device_put, C.points_to_arrays(pts))
    sa = jax.device_put(F.ints_to_array(
        [secrets.randbelow(H.SUBORDER) for _ in range(B)]))
    engines = (os.environ.get("BJJ_MSM_ENGINES") or "pip,lad,masked2").split(",")
    if "pip" in engines:
        bench_engine("pip", M._msm_pip_jit, bx, by, sa, B)
    if "lad" in engines:
        bench_engine("lad", M._msm_lad_jit, bx, by, sa, B)
    for e in engines:
        # maskedN: gather-free bucket engine at w=N (see msm_masked_core)
        if e.startswith("masked"):
            w = int(e[6:] or 2)
            eng = jax.jit(lambda a, s, w=w: M.msm_masked_core(a, s, w=w))
            bench_engine(e, eng, bx, by, sa, B)
