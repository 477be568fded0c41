"""Scaling report: sharded batch-verify across mesh sizes.

On real multi-chip hardware this measures ICI scaling efficiency
(BASELINE.json config 5). Without a pod, it runs the identical sharded
program on N virtual CPU devices — validating the mesh/collective path
and measuring sharding overhead (all virtual devices share one host, so
wall-clock speedup is not expected; per-lane cost inflation is the
signal). Run on a pod slice unchanged for the real table.

Usage: python scripts/scaling_report.py [--devices 8] [--per-device 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--per-device", type=int, default=512)
    ap.add_argument("--force-cpu", action="store_true", default=None)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__), os.pardir,
                                       ".jax_cache"))
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if len(jax.devices()) < args.devices or args.force_cpu:
        # a backend (the axon TPU) may already be initialized by the
        # container's sitecustomize: drop it BEFORE re-pinning the
        # platform, else the update is silently ignored
        jax.clear_caches()
        try:
            from jax.extend.backend import clear_backends
            clear_backends()
        except Exception:
            pass
        jax.config.update("jax_platforms", "cpu")
        from babyjubjub_tpu.ops import field as _F
        _F._default_backend_is_accel.cache_clear()
    simulated = jax.devices()[0].platform == "cpu"

    import secrets
    import numpy as np
    from babyjubjub_tpu.ops import field as F, curve as C
    from babyjubjub_tpu.models import eddsa, keys
    from babyjubjub_tpu.parallel import mesh as M, sharded as S
    from babyjubjub_tpu.utils import hostmath as H, timing

    ndev_all = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= min(ndev_all,
                                                         args.devices)]

    nk = 4
    ks = [keys.new_key_bytes() for _ in range(nk)]
    msgs = [secrets.randbelow(H.Q) for _ in range(nk)]
    pks = eddsa.public_batch(ks)
    sigs = eddsa.sign_batch(ks, msgs)

    rows = []
    for n in sizes:
        b = args.per_device * n
        idx = range(b)
        ax, ay = C.points_to_arrays([pks[i % nk] for i in idx])
        rx, ry = C.points_to_arrays([sigs[i % nk][0] for i in idx])
        ss = F.ints_to_array([sigs[i % nk][1] for i in idx])
        ms = F.ints_to_array([msgs[i % nk] % H.Q for i in idx])
        mesh = M.make_mesh(n)
        vf = S.verify_sharded(mesh)
        ok = np.asarray(vf(rx, ry, ax, ay, ss, ms))
        assert ok.all(), f"n={n}: sharded verify failed"

        def step(m, _vf=vf, _a=(rx, ry, ax, ay, ss)):
            okv = _vf(_a[0], _a[1], _a[2], _a[3], _a[4], m)
            return m.at[0].set((m[0] + okv.astype(np.uint32)) & 0xFFFF)

        dt = timing.chain_timer(step, ms, 1, 3)
        rows.append({"devices": n, "batch": b,
                     "verifies_per_sec": round(b / dt, 1),
                     "per_device": round(b / dt / n, 1)})
        print(json.dumps(rows[-1]), flush=True)

    base = rows[0]["per_device"]
    for r in rows:
        r["efficiency"] = round(r["per_device"] / base, 3)
    print(json.dumps({"simulated_cpu_mesh": simulated, "rows": rows}))


if __name__ == "__main__":
    main()
