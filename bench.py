"""Benchmark harness. Prints ONE JSON line with the headline metric.

Headline: BabyJubJub variable-base scalar mults/sec/chip (BASELINE.md
north star: >= 10M/s on a v5e-8, i.e. 1.25M/s/chip). Also measures batch
EdDSA-Poseidon verifies/sec (north star 1M/s per 8 chips = 125k/s/chip)
and the criterion-suite analogs, reported in the `extra` field.

Usage: python bench.py [--batch N] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))


def _time_op(fn, args, iters, warmup=2):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import secrets
    import jax
    import numpy as np
    from babyjubjub_tpu.ops import field as F, curve as C
    from babyjubjub_tpu.models import eddsa, keys
    from babyjubjub_tpu.utils import hostmath as H

    ndev = len(jax.devices())
    platform = jax.devices()[0].platform
    B = args.batch or (512 if args.quick or platform == "cpu" else 16384)
    iters = 2 if args.quick or platform == "cpu" else 10

    rng = np.random.default_rng(0)

    # ---- headline: variable-base scalar mults/s --------------------------
    scalars = [secrets.randbelow(H.SUBORDER) for _ in range(B)]
    pts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER))
           for _ in range(min(B, 64))]
    pts = (pts * (B // len(pts) + 1))[:B]
    ba = C.points_to_arrays(pts)
    sa = F.ints_to_array(scalars)
    mul_fn = jax.jit(C.scalar_mul_windowed)
    dt_mul = _time_op(mul_fn, (ba, sa), iters)
    mults_per_s = B / dt_mul

    # ---- batch verify /s ---------------------------------------------------
    nk = min(B, 32)
    ks = [keys.new_key_bytes() for _ in range(nk)]
    msgs = [secrets.randbelow(H.Q) for _ in range(nk)]
    pks = eddsa.public_batch(ks)
    sigs = eddsa.sign_batch(ks, msgs)
    idx = list(range(B))
    vx, vy = C.points_to_arrays([pks[i % nk] for i in idx])
    rx, ry = C.points_to_arrays([sigs[i % nk][0] for i in idx])
    ss = F.ints_to_array([sigs[i % nk][1] for i in idx])
    ms = F.ints_to_array([msgs[i % nk] % H.Q for i in idx])
    ver_fn = jax.jit(eddsa.verify_core)
    ok = np.asarray(ver_fn(rx, ry, vx, vy, ss, ms))
    assert ok.all(), "bench verify produced False lanes"
    dt_ver = _time_op(ver_fn, (rx, ry, vx, vy, ss, ms), iters)
    verifies_per_s = B / dt_ver

    # ---- micro-benchmarks (criterion-suite analogs) -----------------------
    add_fn = jax.jit(lambda p, q: C.add(p, q))
    pp = tuple(jnp_bcast(c) for c in C.to_projective(ba))
    dt_add = _time_op(add_fn, (pp, pp), iters)

    per_chip = mults_per_s / ndev
    baseline_per_chip = 10_000_000 / 8  # BASELINE.json north star on v5e-8
    result = {
        "metric": "babyjubjub_scalar_mults_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "ops/s",
        "vs_baseline": round(per_chip / baseline_per_chip, 4),
        "extra": {
            "platform": platform,
            "n_devices": ndev,
            "batch": B,
            "scalar_mults_per_sec_total": round(mults_per_s, 1),
            "eddsa_verifies_per_sec_total": round(verifies_per_s, 1),
            "eddsa_verifies_per_sec_per_chip": round(verifies_per_s / ndev, 1),
            "verify_vs_baseline": round(
                (verifies_per_s / ndev) / (1_000_000 / 8), 4),
            "point_adds_per_sec": round(B / dt_add, 1),
        },
    }
    print(json.dumps(result))


def jnp_bcast(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


if __name__ == "__main__":
    sys.exit(main())
