"""Deterministic compilation-cache keys for Pallas/Mosaic kernels.

Root cause (diagnosed round 4): XLA's persistent compilation cache
canonicalizes debug locations in the TOP-LEVEL StableHLO module before
hashing, but a Pallas TPU kernel rides inside the opaque
``tpu_custom_call`` backend_config as serialized MLIR bytecode — and
that bytecode embeds source-location scopes from whichever jitted
function happened to TRACE the kernel first in the process (e.g. a
mulmod kernel first traced under ``sign_core_packed`` carries that name
in every later caller's payload). Different trace order => different
payload bytes => different cache key => cross-process cache misses that
re-pay multi-minute Mosaic compiles (the round-2/3 driver-bench rc=124
failure mode).

Fix: run MLIR's standard ``strip-debuginfo`` pass on the Mosaic kernel
module immediately before mosaic-serde serialization. Kernel semantics
are untouched; in-kernel error messages lose source locations (set
BJJ_STRIP_KERNEL_DEBUG=0 to restore them while debugging a kernel).

Verified: lowering ``public_core_canon`` before vs after
``sign_core_packed`` yields byte-identical modules with the pass
(sha 96bea70d... both orders) and different bytes without it.
"""

from __future__ import annotations

import os

_APPLIED = False


def apply() -> bool:
    """Install the strip-debuginfo hook (idempotent). Returns True when
    active; silently no-ops if disabled or jax internals have moved."""
    global _APPLIED
    if _APPLIED:
        return True
    if os.environ.get("BJJ_STRIP_KERNEL_DEBUG", "1") == "0":
        return False
    try:
        import jax._src.tpu_custom_call as tcc
        from jaxlib.mlir.passmanager import PassManager
    except Exception:
        return False
    orig = getattr(tcc, "_lower_mosaic_module_to_asm", None)
    if orig is None:
        # jax internals moved (e.g. an upgrade renamed the hook): report
        # inactive so callers/diagnostics can tell the strip-debuginfo
        # pass is NOT installed, instead of silently reintroducing the
        # cross-process recompile failure mode
        import warnings
        warnings.warn("cachefix: _lower_mosaic_module_to_asm not found; "
                      "Mosaic cache-key determinism fix NOT active")
        return False
    if getattr(orig, "_bjj_stripped", False):
        _APPLIED = True
        return True

    def _lower_stripped(module, *, ir_version=None):
        try:
            with module.context, module.operation.location:
                PassManager.parse(
                    "builtin.module(strip-debuginfo)").run(module.operation)
        except Exception:
            pass  # fall through: correctness first, determinism best-effort
        return orig(module, ir_version=ir_version)

    _lower_stripped._bjj_stripped = True
    tcc._lower_mosaic_module_to_asm = _lower_stripped
    _APPLIED = True
    return True
