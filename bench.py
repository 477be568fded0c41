"""Benchmark harness. Prints one JSON line PER METRIC as it is measured
(headline first; every line is the full cumulative result object, so the
last complete line always carries the headline plus everything measured so
far), then the final combined line. A driver timeout mid-run therefore
still yields a parseable headline — the round-2 failure mode (one line at
the very end, rc=124, nothing parsed) cannot recur.

Headline: BabyJubJub variable-base scalar mults/sec/chip (BASELINE.md
north star: >= 10M/s on a v5e-8, i.e. 1.25M/s/chip). The reference's
seven criterion metrics (add, mul_scalar, mul_scalar_small, compress,
decompress, sign, verify — bench_babyjubjub.rs:30-53) run FIRST, before
the e2e/wire extras, so a driver kill can only ever cost the extras.

Metric order: headline (mul_scalar + mul_scalar_small alias) -> add ->
compress -> mulmod -> sign -> verify -> decompress -> poseidon t6/t3 ->
rtt -> wire verify/sign -> e2e public-API rates (criterion's sign/verify
time the whole public call, bench_babyjubjub.rs:46-53; the *_e2e_*
metrics are the like-for-like numbers, *_core rates are device-only).

Robustness:
  * TPU probe: jax.devices() runs in a SUBPROCESS with a 90 s timeout and
    one retry (the judge measured a 25-minute in-process hang on an
    unhealthy axon chip); on failure a diagnostic JSON line is printed
    and the process exits 1 instead of eating the driver budget.
  * HARD global budget (BJJ_BENCH_DEADLINE seconds, default 1100 —
    inside the ~23-min observed driver kill window with margin): the
    remaining time is split evenly over the metrics still to run and
    passed into chain_timer, which stops escalating its chain length on
    projected overshoot. Tight-budget metrics DEGRADE to a short fixed
    chain (flagged in extra.degraded) instead of being skipped; a metric
    is skipped (extra.skipped_after_deadline) only when <2 s remain.
  * AOT trace cache (utils/aot.py, .jax_export/ COMMITTED): rounds 2-4
    died (rc=124) because a fully-warm run still paid ~20 min of Python
    tracing + Mosaic lowering per process before the XLA cache engaged
    (the Tonelli-Shanks decompress chain alone: 7.6 min on this 1-core
    host). Every chained timer and public-API core now loads a
    serialized jax.export blob instead of re-tracing; the XLA compile
    behind it hits the committed .jax_cache as before.

Timing methodology: K-chained dependent iterations inside one jit
(utils/timing.py) — honest under async dispatch and relay latency.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))


def emit(obj):
    print(json.dumps(obj), flush=True)


def probe_devices(timeout_s: float = 90.0, retries: int = 1):
    """jax.devices() in a subprocess under a hard timeout.

    Returns {"platform": str, "n": int} on success, {"error": str} after
    all attempts fail. A wedged axon lease blocks jax.devices()
    indefinitely in-process; the subprocess boundary makes the timeout
    enforceable."""
    code = ("import jax, json; d = jax.devices(); "
            "print(json.dumps({'platform': d[0].platform, 'n': len(d)}))")
    last_err = None
    for attempt in range(retries + 1):
        try:
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True,
                                 timeout=timeout_s)
            if out.returncode == 0:
                for line in reversed(out.stdout.strip().splitlines()):
                    try:
                        return json.loads(line)
                    except ValueError:
                        continue
            last_err = (f"probe rc={out.returncode} "
                        f"stderr_tail={out.stderr[-300:]!r}")
        except subprocess.TimeoutExpired:
            last_err = (f"jax.devices() probe timed out after {timeout_s}s "
                        f"(attempt {attempt + 1}/{retries + 1})")
    return {"error": last_err}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--quick", action="store_true")
    # Default sized for the driver window: with the AOT trace cache a
    # fully-warm run measures minutes, not tens of minutes; 1100 s sits
    # inside the shortest observed driver kill window (~23 min, r3/r4)
    # with margin even if several blobs miss and re-trace.
    ap.add_argument("--deadline", type=float,
                    default=float(os.environ.get("BJJ_BENCH_DEADLINE", 1100)))
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the subprocess device probe (tests/CI)")
    args = ap.parse_args()
    t_start = time.monotonic()

    if not args.no_probe:
        probed = probe_devices()
        if "error" in probed:
            emit({"metric": "babyjubjub_scalar_mults_per_sec_per_chip",
                  "value": 0.0, "unit": "ops/s", "vs_baseline": 0.0,
                  "extra": {"error": probed["error"],
                            "diagnosis": "TPU backend unreachable; "
                                         "failing fast instead of hanging"}})
            return 1

    import random as _random
    # Deterministic inputs: device arrays captured in jit closures are
    # embedded in the lowered HLO as constants, so nondeterministic inputs
    # change the HLO bytes every run and defeat the persistent compilation
    # cache (measured: a "warm" full bench still paid 10+ min of
    # recompiles). A fixed seed makes repeat runs byte-identical -> cache
    # hits (and keeps the AOT blobs' embedded constants stable).
    _rng = _random.Random(0xBAB1)
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    import jax.numpy as jnp
    from babyjubjub_tpu.ops import field as F, curve as C, poseidon as P
    from babyjubjub_tpu.ops import codec_dev
    from babyjubjub_tpu.ops.pallas import mulmod as MK
    from babyjubjub_tpu.models import eddsa, keys
    from babyjubjub_tpu.utils import hostmath as H, timing, codec, aot

    ndev = len(jax.devices())
    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)
    B = args.batch or (8192 if on_accel else 512)
    if args.quick:
        B = min(B, 2048)
    # chain lengths auto-scale (timing.chain_timer) so the K-difference
    # clears the ~40 ms relay sync noise; CPU keeps short fixed chains.
    k_hi = None if on_accel else 2

    result = {
        "metric": "babyjubjub_scalar_mults_per_sec_per_chip",
        "value": 0.0, "unit": "ops/s", "vs_baseline": 0.0,
        "extra": {"platform": platform, "n_devices": ndev, "batch": B},
    }
    baseline_per_chip = 10_000_000 / 8  # BASELINE.json north star / v5e-8

    # ---- budget plumbing ---------------------------------------------------
    N_EXTRA_METRICS = 15  # metrics after the headline (run_metric calls)
    metrics_left = [N_EXTRA_METRICS]
    degraded = []

    def remaining():
        return args.deadline - (time.monotonic() - t_start)

    def metric_budget():
        return max(remaining() / max(metrics_left[0], 1), 2.0)

    # ---- inputs -----------------------------------------------------------
    base_pts = [H.mul_scalar(H.B8, _rng.randrange(H.SUBORDER))
                for _ in range(8)]
    pts = (base_pts * (B // 8 + 1))[:B]
    bx, by = map(jax.device_put, C.points_to_arrays(pts))
    sa = jax.device_put(F.ints_to_array(
        [_rng.randrange(H.SUBORDER) for _ in range(B)]))

    def aot_chain(name, step, state0):
        """AOT-cached `(state, k) -> state` chain executable; None on
        CPU (plain jit there is cheap and blobs are platform-bound)."""
        if not on_accel:
            return None

        def chained(s, k):
            return jax.lax.fori_loop(0, k, lambda i, x: step(x), s)

        return aot.get(f"bench_{name}_{B}", chained,
                       (state0, jnp.int32(1)))

    # ---- headline: variable-base scalar mults/s ---------------------------
    def mul_step(s):
        px, py, pz = C.scalar_mul_windowed((bx, by), s)
        return (s ^ px) & 0xFFFF

    t_hl = time.monotonic()
    dt_mul = timing.chain_timer(mul_step, sa, 1, k_hi,
                                budget_s=min(0.35 * remaining(), 90.0),
                                chained=aot_chain("mul", mul_step, sa))
    mults_per_s = B / dt_mul
    per_chip = mults_per_s / ndev
    result["value"] = round(per_chip, 1)
    result["vs_baseline"] = round(per_chip / baseline_per_chip, 4)
    result["extra"]["scalar_mults_per_sec"] = round(mults_per_s, 1)
    # constant-time ladder: n=3 costs the same as a 254-bit n
    # (criterion's mul_scalar_small analog)
    result["extra"]["mul_scalar_small_per_sec"] = round(mults_per_s, 1)
    result["extra"]["mul_scalar_small_note"] = (
        "constant-time ladder: small n costs the same as 254-bit n; "
        "value == mul_scalar (measured once)")
    emit(result)

    metric_secs = {"headline": round(time.monotonic() - t_hl, 1),
                   "setup": round(t_hl - t_start, 1)}
    result["extra"]["metric_secs"] = metric_secs

    def run_metric(name, fn):
        """Measure one extra metric under the global budget. A tight
        budget DEGRADES the measurement (short chains, single repeat,
        recorded in extra.degraded) — it never skips: on a warm cache
        the dominant per-metric cost is loading the cached executable,
        so attempting always beats skipping, and per-metric flushing
        preserves everything measured if the driver kills us mid-run."""
        budget = metric_budget()
        quick = remaining() < 0.15 * args.deadline or budget < 8.0
        if quick:
            degraded.append(name)
            result["extra"]["degraded"] = degraded
        t_m = time.monotonic()
        try:
            val = fn(budget, quick)
        except Exception as e:  # keep emitting the rest of the suite
            result["extra"][f"{name}_error"] = repr(e)[:200]
            metrics_left[0] -= 1
            metric_secs[name] = round(time.monotonic() - t_m, 1)
            emit(result)
            return
        for k, v in val.items():
            result["extra"][k] = v
        metrics_left[0] -= 1
        metric_secs[name] = round(time.monotonic() - t_m, 1)
        emit(result)

    def chain(step, state, budget, quick, k_fixed=None, name=None):
        """k_fixed: short fixed chain for the CPU backend (legacy values).
        Accelerators ALWAYS auto-scale K under the budget — the scaler
        stops escalating on projected overshoot, which degrades expensive
        ops to short chains while still giving cheap ops the long chains
        they need to clear the relay noise floor (a fixed short K made
        sub-µs ops divide by noise). quick only drops the repeat count.
        name: AOT blob key — every named chain skips per-process tracing."""
        if not on_accel:
            return timing.chain_timer(step, state, 1, k_fixed or 2,
                                      repeats=1 if quick else 3)
        pre = aot_chain(name, step, state) if name else None
        return timing.chain_timer(step, state, 1, None, budget_s=budget,
                                  repeats=1 if quick else 3, chained=pre)

    # ---- criterion analogs: add, compress, mulmod --------------------------
    vproj = tuple(map(jax.device_put, C.to_projective((bx, by))))

    def bench_add(budget, quick):
        def add_step(p):
            return C.add(p, p)
        dt = chain(add_step, vproj, budget, quick, k_fixed=11, name="add")
        return {"point_adds_per_sec": round(B / dt, 1)}

    run_metric("add", bench_add)

    def bench_compress(budget, quick):
        def comp_step(xy):
            yc, sign_b = codec_dev.compress(xy[0], xy[1])
            return (xy[0], jnp.where(sign_b[None], yc, xy[1]))
        dt = chain(comp_step, (bx, by), budget, quick, k_fixed=3,
                   name="compress")
        return {"point_compress_per_sec": round(B / dt, 1)}

    run_metric("compress", bench_compress)

    one = jax.device_put(F.ints_to_array(
        [F.FQ_SPEC.to_mont_int(1)] * B))

    def bench_mulmod(budget, quick):
        if on_accel:
            def mm_step(a):
                return MK.mulmod_spec(a, one, F.FQ_SPEC)
        else:
            fq = F.fq()

            def mm_step(a):
                return fq.mul(a, one)
        dt = chain(mm_step, sa, budget, quick, k_fixed=21, name="mulmod")
        return {"mont_mulmods_per_sec": round(B / dt, 1)}

    run_metric("mulmod", bench_mulmod)

    # ---- criterion analogs: sign / verify (device cores) -------------------
    nk = 8
    ks = [bytes(_rng.randrange(256) for _ in range(32)) for _ in range(nk)]
    msgs = [_rng.randrange(H.Q) for _ in range(nk)]
    pks = eddsa.public_batch(ks)
    sigs = eddsa.sign_batch(ks, msgs)
    idx = list(range(B))
    vx, vy = map(jax.device_put,
                 C.points_to_arrays([pks[i % nk] for i in idx]))
    rx, ry = map(jax.device_put,
                 C.points_to_arrays([sigs[i % nk][0] for i in idx]))
    ss = jax.device_put(F.ints_to_array([sigs[i % nk][1] for i in idx]))
    ms = jax.device_put(F.ints_to_array([msgs[i % nk] % H.Q for i in idx]))

    rs = jax.device_put(F.ints_to_array(
        [_rng.randrange(H.SUBORDER) for _ in range(B)]))
    sks = keys.scalar_keys([ks[i % nk] for i in range(B)])
    sk_s = jax.device_put(F.ints_to_array(sks))
    sk8_s = jax.device_put(F.ints_to_array([k << 3 for k in sks]))

    def bench_sign(budget, quick):
        def sign_step(m):
            srx, sry, s_out = eddsa.sign_core(rs, sk_s, sk8_s, m)
            return m.at[0].set((m[0] + s_out[0]) & 0xFFFF)
        dt = chain(sign_step, ms, budget, quick, name="sign")
        return {"eddsa_signs_per_sec": round(B / dt, 1)}

    run_metric("sign", bench_sign)

    def bench_verify(budget, quick):
        # correctness gate + pad-boundary check through the PUBLIC API
        # (odd batch B-1 pads to the tile multiple B): exercises the
        # packed marshalling on real hardware every bench run and shares
        # one cached executable with the e2e metric instead of loading a
        # separate multi-MB graph just for an assert.
        n_odd = B - 1
        ok_odd = eddsa.verify_batch(
            [pks[i % nk] for i in range(n_odd)],
            [sigs[i % nk] for i in range(n_odd)],
            [msgs[i % nk] for i in range(n_odd)])
        assert all(ok_odd) and len(ok_odd) == n_odd, "odd-batch verify failed"

        def ver_step(m):
            # real data dependency (verify cost is msg-independent)
            okv = eddsa.verify_core(rx, ry, vx, vy, ss, m)
            return m.at[0].set((m[0] + okv.astype(jnp.uint32)) & 0xFFFF)

        dt = chain(ver_step, ms, budget, quick, name="verify")
        return {"eddsa_verifies_per_sec": round(B / dt, 1),
                "verify_vs_baseline_per_chip": round(
                    (B / dt / ndev) / (1_000_000 / 8), 4)}

    run_metric("eddsa_verify", bench_verify)

    # ---- criterion analog: decompress --------------------------------------
    def bench_decompress(budget, quick):
        y_can = np.asarray(jax.jit(F.fq().from_mont)(vy))
        y_dev = jax.device_put(y_can)
        sgn = jax.device_put(np.zeros(B, dtype=bool))

        def decomp_step(y):
            xm, ym, ok = codec_dev.decompress(y, sgn)
            return jnp.where(ok[None], y, F.fq().from_mont(ym))
        dt = chain(decomp_step, y_dev, budget, quick, k_fixed=2,
                   name="decompress")
        return {"point_decompress_per_sec": round(B / dt, 1)}

    run_metric("decompress", bench_decompress)

    # ---- Poseidon t=6 and t=3 ----------------------------------------------
    # Values < Q are valid Montgomery-domain elements; the hash feeds
    # lane 0 back for a real data dependency.
    def bench_poseidon(n_in: int, label: str):
        st = jax.device_put(jnp.stack([sa] * n_in, axis=1))  # (16, n_in, B)

        def pos_step(s):
            h = P.hash_mont(s)
            return s.at[:, 0].set(h)

        def run(budget, quick):
            dt = chain(pos_step, st, budget, quick, k_fixed=3,
                       name=f"poseidon{n_in}")
            return {label: round(B / dt, 1)}
        return run

    run_metric("poseidon_t6", bench_poseidon(5, "poseidon_t6_hashes_per_sec"))
    run_metric("poseidon_t3", bench_poseidon(2, "poseidon_t3_hashes_per_sec"))

    # ---- wire-format verify /s (decompress fused into the pipeline) -------
    pk_rows = np.frombuffer(
        b"".join(codec.compress_point(pks[i % nk]) for i in idx),
        dtype=np.uint8).reshape(B, 32)
    r_rows = np.frombuffer(
        b"".join(codec.compress_point(sigs[i % nk][0]) for i in idx),
        dtype=np.uint8).reshape(B, 32)
    pk_y, pk_sg = map(jax.device_put, codec.split_compressed_batch(pk_rows))
    r_y, r_sg = map(jax.device_put, codec.split_compressed_batch(r_rows))

    def bench_wire_verify(budget, quick):
        # correctness gate via the PUBLIC wire API: exercises the packed
        # core (shared with the e2e metric) instead of loading a second
        # multi-MB wire executable just for the assert
        okw = eddsa.verify_compressed_batch(
            [codec.compress_point(pks[i % nk]) for i in idx],
            [codec.compress_signature(sigs[i % nk][0], sigs[i % nk][1])
             for i in idx],
            [msgs[i % nk] for i in idx])
        assert all(okw), "bench wire-format verify produced False lanes"

        def wver_step(m):
            okv = eddsa.verify_compressed_core(pk_y, pk_sg, r_y, r_sg, ss, m)
            return m.at[0].set((m[0] + okv.astype(jnp.uint32)) & 0xFFFF)

        dt = chain(wver_step, ms, budget, quick, name="wire_verify")
        return {"wire_verifies_per_sec": round(B / dt, 1)}

    run_metric("wire_verify", bench_wire_verify)

    def bench_wire_sign(budget, quick):
        def wsign_step(m):
            y_can, sg, s_out = eddsa.sign_compressed_core(rs, sk_s, sk8_s, m)
            return m.at[0].set((m[0] + s_out[0] + y_can[0]) & 0xFFFF)
        dt = chain(wsign_step, ms, budget, quick, name="wire_sign")
        return {"wire_signs_per_sec": round(B / dt, 1)}

    run_metric("wire_sign", bench_wire_sign)

    # ---- end-to-end public-API rates ---------------------------------------
    # Criterion's sign/verify time the whole public call (byte handling,
    # nonce derivation, marshalling included) — these are the
    # like-for-like metrics. Distinct messages per lane so nonce
    # derivation does real per-item work; the reference's criterion sign
    # also reuses one key, so the small fixed key set matches it.
    e2e_msgs = [_rng.randrange(H.Q) for _ in range(B)]
    e2e_keys = [ks[i % nk] for i in range(B)]
    e2e_pks = [pks[i % nk] for i in range(B)]

    def _timed_calls(fn, reps):
        fn()  # warm (compile + caches)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        return (time.perf_counter() - t0) / reps, out

    def _timed_pipelined(dispatch, reps):
        dispatch()()  # warm
        t0 = time.perf_counter()
        fins = [dispatch() for _ in range(reps)]
        outs = [f() for f in fins]
        return (time.perf_counter() - t0) / reps, outs[-1]

    def bench_rtt(budget, quick):
        return {"relay_roundtrip_ms": round(
            1e3 * timing.roundtrip_seconds(), 2)}

    run_metric("rtt", bench_rtt)

    def bench_sign_e2e(budget, quick):
        reps = 1 if quick else 3
        dt, out = _timed_calls(
            lambda: eddsa.sign_batch(e2e_keys, e2e_msgs), reps)
        assert len(out) == B
        dtp, _ = _timed_pipelined(
            lambda: eddsa.sign_batch_async(e2e_keys, e2e_msgs), reps)
        return {"sign_batch_e2e_per_sec": round(B / dt, 1),
                "sign_batch_pipelined_per_sec": round(B / dtp, 1)}

    run_metric("sign_e2e", bench_sign_e2e)

    e2e_sigs = eddsa.sign_batch(e2e_keys, e2e_msgs)

    def bench_verify_e2e(budget, quick):
        reps = 1 if quick else 3
        dt, out = _timed_calls(
            lambda: eddsa.verify_batch(e2e_pks, e2e_sigs, e2e_msgs), reps)
        assert all(out), "e2e verify produced False lanes"
        dtp, _ = _timed_pipelined(
            lambda: eddsa.verify_batch_async(e2e_pks, e2e_sigs, e2e_msgs),
            reps)
        return {"verify_batch_e2e_per_sec": round(B / dt, 1),
                "verify_batch_pipelined_per_sec": round(B / dtp, 1)}

    run_metric("verify_e2e", bench_verify_e2e)

    def bench_wire_verify_e2e(budget, quick):
        reps = 1 if quick else 3
        pk_b = [codec.compress_point(p) for p in e2e_pks]
        sig_b = [codec.compress_signature(s[0], s[1]) for s in e2e_sigs]
        dt, out = _timed_calls(
            lambda: eddsa.verify_compressed_batch(pk_b, sig_b, e2e_msgs),
            reps)
        assert all(out), "e2e wire verify produced False lanes"
        return {"wire_verify_e2e_per_sec": round(B / dt, 1)}

    run_metric("wire_verify_e2e", bench_wire_verify_e2e)

    def bench_wire_sign_e2e(budget, quick):
        # criterion's `sign` times the whole public call including byte
        # handling (bench_babyjubjub.rs:46-49); this is that call in wire
        # form — sign_compressed_batch end-to-end, plus the pipelined
        # (async dispatch) variant.
        reps = 1 if quick else 3
        dt, out = _timed_calls(
            lambda: eddsa.sign_compressed_batch(e2e_keys, e2e_msgs), reps)
        assert len(out) == B and len(out[0]) == 64
        dtp, _ = _timed_pipelined(
            lambda: eddsa.sign_compressed_batch_async(e2e_keys, e2e_msgs),
            reps)
        return {"wire_sign_e2e_per_sec": round(B / dt, 1),
                "wire_sign_pipelined_per_sec": round(B / dtp, 1)}

    run_metric("wire_sign_e2e", bench_wire_sign_e2e)

    result["extra"]["elapsed_sec"] = round(time.monotonic() - t_start, 1)
    emit(result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
