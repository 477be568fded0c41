"""Benchmark harness. Prints ONE JSON line with the headline metric.

Headline: BabyJubJub variable-base scalar mults/sec/chip (BASELINE.md
north star: >= 10M/s on a v5e-8, i.e. 1.25M/s/chip). Extras: batch
EdDSA-Poseidon verifies/sec (north star 1M/s per 8 chips), Poseidon
hashes/sec, Montgomery mulmods/sec, point adds/sec — the criterion-suite
analogs of /root/reference/benches/bench_babyjubjub.rs.

Timing methodology: K-chained dependent iterations inside one jit
(utils/timing.py) — honest under async dispatch and relay latency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import secrets
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from babyjubjub_tpu.ops import field as F, curve as C, poseidon as P
    from babyjubjub_tpu.ops.pallas import mulmod as MK
    from babyjubjub_tpu.models import eddsa, keys
    from babyjubjub_tpu.utils import hostmath as H, timing

    ndev = len(jax.devices())
    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)
    B = args.batch or (8192 if on_accel else 512)
    if args.quick:
        B = min(B, 2048)
    # chain lengths auto-scale (timing.chain_timer) so the K-difference
    # clears the ~40 ms relay sync noise; CPU keeps short fixed chains.
    k_hi = None if on_accel else 2

    # ---- inputs -----------------------------------------------------------
    base_pts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER))
                for _ in range(8)]
    pts = (base_pts * (B // 8 + 1))[:B]
    bx, by = map(jax.device_put, C.points_to_arrays(pts))
    sa = jax.device_put(F.ints_to_array(
        [secrets.randbelow(H.SUBORDER) for _ in range(B)]))

    # ---- headline: variable-base scalar mults/s ---------------------------
    def mul_step(s):
        px, py, pz = C.scalar_mul_windowed((bx, by), s)
        return (s ^ px) & 0xFFFF

    dt_mul = timing.chain_timer(mul_step, sa, 1, k_hi)
    mults_per_s = B / dt_mul

    # ---- batch EdDSA verify /s --------------------------------------------
    nk = 8
    ks = [keys.new_key_bytes() for _ in range(nk)]
    msgs = [secrets.randbelow(H.Q) for _ in range(nk)]
    pks = eddsa.public_batch(ks)
    sigs = eddsa.sign_batch(ks, msgs)
    idx = list(range(B))
    vx, vy = map(jax.device_put,
                 C.points_to_arrays([pks[i % nk] for i in idx]))
    rx, ry = map(jax.device_put,
                 C.points_to_arrays([sigs[i % nk][0] for i in idx]))
    ss = jax.device_put(F.ints_to_array([sigs[i % nk][1] for i in idx]))
    ms = jax.device_put(F.ints_to_array([msgs[i % nk] % H.Q for i in idx]))

    ok = np.asarray(eddsa._verify_core(rx, ry, vx, vy, ss, ms))
    assert ok.all(), "bench verify produced False lanes"

    # pad-boundary check: an odd batch (B-1) pads to the tile multiple B
    # and reuses the SAME compiled graph; exercises the pad+slice
    # marshalling on real hardware every bench run.
    n_odd = B - 1
    ok_odd = eddsa.verify_batch(
        [pks[i % nk] for i in range(n_odd)],
        [sigs[i % nk] for i in range(n_odd)],
        [msgs[i % nk] for i in range(n_odd)])
    assert all(ok_odd) and len(ok_odd) == n_odd, "odd-batch verify failed"

    def ver_step(m):
        # real data dependency (verify cost is msg-independent)
        okv = eddsa.verify_core(rx, ry, vx, vy, ss, m)
        return m.at[0].set((m[0] + okv.astype(jax.numpy.uint32)) & 0xFFFF)

    dt_ver = timing.chain_timer(ver_step, ms, 1, k_hi)
    verifies_per_s = B / dt_ver

    # ---- wire-format verify /s (decompress fused into the pipeline) -------
    from babyjubjub_tpu.utils import codec
    pk_rows = np.frombuffer(
        b"".join(codec.compress_point(pks[i % nk]) for i in idx),
        dtype=np.uint8).reshape(B, 32)
    r_rows = np.frombuffer(
        b"".join(codec.compress_point(sigs[i % nk][0]) for i in idx),
        dtype=np.uint8).reshape(B, 32)
    pk_y, pk_sg = map(jax.device_put, codec.split_compressed_batch(pk_rows))
    r_y, r_sg = map(jax.device_put, codec.split_compressed_batch(r_rows))

    okw = np.asarray(eddsa._verify_compressed_core(
        pk_y, pk_sg, r_y, r_sg, ss, ms))
    assert okw.all(), "bench wire-format verify produced False lanes"

    def wver_step(m):
        okv = eddsa.verify_compressed_core(pk_y, pk_sg, r_y, r_sg, ss, m)
        return m.at[0].set((m[0] + okv.astype(jax.numpy.uint32)) & 0xFFFF)

    dt_wver = timing.chain_timer(wver_step, ms, 1, k_hi)
    wire_verifies_per_s = B / dt_wver

    # ---- micro benches (criterion analogs) --------------------------------
    one = jax.device_put(F.ints_to_array(
        [F.FQ_SPEC.to_mont_int(1)] * B))

    if on_accel:
        def mm_step(a):
            return MK.mulmod_spec(a, one, F.FQ_SPEC)
        dt_mm = timing.chain_timer(mm_step, sa, 1, k_hi)
    else:
        fq = F.fq()
        def mm_step(a):
            return fq.mul(a, one)
        dt_mm = timing.chain_timer(mm_step, sa, 1, 21)
    mulmods_per_s = B / dt_mm

    def add_step(p):
        return C.add(p, p)
    proj = tuple(map(jax.device_put, C.to_projective((bx, by))))
    dt_add = timing.chain_timer(add_step, proj, 1, k_hi if on_accel else 11)
    adds_per_s = B / dt_add

    # Poseidon t=6 (5 inputs), tile-aligned batch; values < Q are valid
    # Montgomery-domain elements, and the hash feeds lane 0 back for a
    # real data dependency.
    st = jax.device_put(jax.numpy.stack([sa] * 5, axis=1))  # (16, 5, B)
    def pos_step(s):
        h = P.hash_mont(s)
        return s.at[:, 0].set(h)
    dt_pos = timing.chain_timer(pos_step, st, 1, k_hi if on_accel else 3)
    hashes_per_s = B / dt_pos

    # ---- sign / compress / decompress (criterion analogs) -----------------
    import jax.numpy as jnp
    from babyjubjub_tpu.ops import codec_dev

    rs = F.ints_to_array([secrets.randbelow(H.SUBORDER) for _ in range(B)])
    sks = [keys.scalar_key(ks[i % nk]) for i in range(B)]
    sk_s = jax.device_put(F.ints_to_array(sks))
    sk8_s = jax.device_put(F.ints_to_array([k << 3 for k in sks]))
    rs = jax.device_put(rs)

    def sign_step(m):
        srx, sry, s_out = eddsa.sign_core(rs, sk_s, sk8_s, m)
        return m.at[0].set((m[0] + s_out[0]) & 0xFFFF)
    dt_sign = timing.chain_timer(sign_step, ms, 1, k_hi if on_accel else 2)
    signs_per_s = B / dt_sign

    def comp_step(xy):
        yc, sign_b = codec_dev.compress(xy[0], xy[1])
        return (xy[0], jnp.where(sign_b[None], yc, xy[1]))
    dt_comp = timing.chain_timer(comp_step, (vx, vy), 1,
                                 k_hi if on_accel else 3)
    compress_per_s = B / dt_comp

    y_can = np.asarray(jax.jit(F.fq().from_mont)(vy))
    y_dev = jax.device_put(y_can)
    sgn = jax.device_put(np.zeros(B, dtype=bool))

    def decomp_step(y):
        xm, ym, ok = codec_dev.decompress(y, sgn)
        return jnp.where(ok[None], y, F.fq().from_mont(ym))
    dt_dec = timing.chain_timer(decomp_step, y_dev, 1,
                                k_hi if on_accel else 2)
    decompress_per_s = B / dt_dec

    per_chip = mults_per_s / ndev
    baseline_per_chip = 10_000_000 / 8  # BASELINE.json north star / v5e-8
    result = {
        "metric": "babyjubjub_scalar_mults_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "ops/s",
        "vs_baseline": round(per_chip / baseline_per_chip, 4),
        "extra": {
            "platform": platform,
            "n_devices": ndev,
            "batch": B,
            "scalar_mults_per_sec": round(mults_per_s, 1),
            "eddsa_verifies_per_sec": round(verifies_per_s, 1),
            "wire_verifies_per_sec": round(wire_verifies_per_s, 1),
            "verify_vs_baseline_per_chip": round(
                (verifies_per_s / ndev) / (1_000_000 / 8), 4),
            # constant-time ladder: n=3 costs the same as a 254-bit n
            # (criterion's mul_scalar_small analog)
            "mul_scalar_small_per_sec": round(mults_per_s, 1),
            "eddsa_signs_per_sec": round(signs_per_s, 1),
            "point_compress_per_sec": round(compress_per_s, 1),
            "point_decompress_per_sec": round(decompress_per_s, 1),
            "mont_mulmods_per_sec": round(mulmods_per_s, 1),
            "point_adds_per_sec": round(adds_per_s, 1),
            "poseidon_t6_hashes_per_sec":
                round(hashes_per_s, 1) if hashes_per_s else None,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
