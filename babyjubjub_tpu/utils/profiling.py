"""Tracing / profiling subsystem (SURVEY.md section 5.1 parity-plus).

The reference ships only criterion micro-benchmarks; the TPU framework
exposes:
  * `trace(path)` — context manager around jax.profiler for device
    traces viewable in XProf/TensorBoard,
  * `chain_timer` re-export — the honest throughput methodology,
  * `op_report` — quick ops/s table for the core kernels.
"""

from __future__ import annotations

import contextlib

import jax

from .timing import chain_timer  # noqa: F401  (re-export)


@contextlib.contextmanager
def trace(path: str = "/tmp/bjj_trace"):
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


def op_report(batch: int = 8192) -> dict:
    """Measure the core kernel suite; returns {name: ops_per_sec}."""
    import secrets
    import jax.numpy as jnp
    from ..ops import field as F, curve as C
    from ..utils import hostmath as H

    fq = F.fq()
    sa = jax.device_put(F.ints_to_array(
        [secrets.randbelow(H.Q) for _ in range(batch)]))
    sb = jax.device_put(F.ints_to_array(
        [secrets.randbelow(H.Q) for _ in range(batch)]))

    # auto-scaled chains on accelerators (k_hi=None); short fixed on CPU
    # (k=9 / 2 repeats: each distinct K traces+compiles its own chained
    # graph, so long CPU chains buy noise reduction the single-core box
    # cannot afford -- rates there are indicative, not benchmarks)
    cpu = jax.default_backend() == "cpu"
    k = None if not cpu else 9
    reps = 2 if cpu else 3
    out = {}
    out["mulmod"] = batch / chain_timer(lambda a: fq.mul(a, sb), sa, 1, k,
                                        repeats=reps)
    out["addmod"] = batch / chain_timer(lambda a: fq.add(a, sb), sa, 1, k,
                                        repeats=reps)

    pts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER))
           for _ in range(8)]
    bx, by = map(jax.device_put,
                 C.points_to_arrays((pts * (batch // 8 + 1))[:batch]))
    proj = C.to_projective((bx, by))

    def addp(p):
        return C.add(p, p)
    out["point_add"] = batch / chain_timer(addp, proj, 1,
                                           k if k else None, repeats=reps)

    def mul_step(s):
        px, py, pz = C.scalar_mul_windowed((bx, by), s)
        return (s ^ px) & 0xFFFF
    out["scalar_mul"] = batch / chain_timer(mul_step, sa, 1,
                                            2 if k else None, repeats=reps)
    return out
