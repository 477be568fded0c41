"""Cross-process AOT trace cache (jax.export) for the bench suite.

Measured failure mode (rounds 2-4, BENCH rc=124 three rounds running):
a fully WARM bench run still took ~26 min because every process pays
Python tracing + Pallas->Mosaic lowering again for each mega-kernel
before the persistent XLA compilation cache is even consulted — the
Tonelli-Shanks decompress chain alone traced for 7.6 min and the fused
wire-verify pipeline for ~7 min on this 1-core host (timestamps in
/tmp/bench_r4_logged.log between consecutive cache-hit lines). The XLA
cache (.jax_cache) only caches the post-lowering compile; nothing in
stock JAX caches the trace/lowering step across processes.

This module does: `jax.export.export` the jitted function once, store
the serialized StableHLO (Mosaic payloads embedded as custom-call
backend configs) under .jax_export/, and on later runs deserialize +
`jax.jit(exported.call)` — no Python re-trace, no Pallas emit, no
Mosaic lowering. The XLA compile of the deserialized module still hits
.jax_cache as usual.

Staleness: entries are keyed by (name, abstracted arg signature,
jax version, sha256 over every babyjubjub_tpu/*.py source file and the
caller file). ANY source edit invalidates the whole cache; the next
bench run rebuilds it (paying one trace) and commits the new blobs.
This is deliberately coarse — a stale kernel silently measuring old
code would be worse than a slow rebuild.

Platform: blobs are exported for the platform they were built on
(tpu); `load` returns None on a platform mismatch so callers fall back
to the plain jit path (CPU tests never read tpu blobs).
"""

from __future__ import annotations

import hashlib
import os

import jax

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REPO_DIR = os.path.dirname(_PKG_DIR)
_CACHE_DIR = os.environ.get(
    "BJJ_EXPORT_CACHE", os.path.join(_REPO_DIR, ".jax_export"))

_src_hash_memo = None


def _source_hash() -> str:
    """sha256 over every .py source in the package plus the repo-root
    .py files (bench.py etc. define the chain step closures the blobs
    embed — editing one must invalidate, or a stale blob would silently
    measure old code), in sorted path order."""
    global _src_hash_memo
    if _src_hash_memo is None:
        h = hashlib.sha256()
        paths = []
        for root, _dirs, files in sorted(os.walk(_PKG_DIR)):
            paths += [os.path.join(root, fn) for fn in sorted(files)
                      if fn.endswith(".py")]
        try:
            paths += [os.path.join(_REPO_DIR, fn)
                      for fn in sorted(os.listdir(_REPO_DIR))
                      if fn.endswith(".py")]
        except OSError:
            pass
        for p in paths:
            h.update(p.encode())
            with open(p, "rb") as f:
                h.update(f.read())
        _src_hash_memo = h.hexdigest()[:16]
    return _src_hash_memo


def _abstract_sig(args) -> str:
    leaves = jax.tree_util.tree_leaves(args)
    return ";".join(f"{l.shape}/{l.dtype}" for l in map(
        lambda a: jax.api_util.shaped_abstractify(a), leaves))


def _entry_path(name: str, args) -> str:
    key = hashlib.sha256(
        f"{name}|{_abstract_sig(args)}|{jax.__version__}|{_source_hash()}"
        .encode()).hexdigest()[:24]
    return os.path.join(_CACHE_DIR, f"{name}-{key}.jaxexp")


def load(name: str, args):
    """Return a jitted callable for a previously exported `name` with
    this arg signature, or None (missing blob / wrong platform /
    deserialization failure — callers fall back to plain jit)."""
    path = _entry_path(name, args)
    if not os.path.exists(path):
        return None
    try:
        from jax import export as jexp
        with open(path, "rb") as f:
            exp = jexp.deserialize(bytearray(f.read()))
        plat = jax.devices()[0].platform.upper()
        if plat not in {p.upper() for p in exp.platforms}:
            return None
        return jax.jit(exp.call)
    except Exception:
        return None


def build(name: str, fn, args):
    """Trace + export `fn` at `args`' signature, persist the blob, and
    return the RELOADED jit(exp.call) callable — NOT the plain jitted
    fn. The two lower to different HLO module bytes (the export wrapper
    renames the module), so they key different entries in the
    persistent XLA cache and in the relay's server-side compile cache;
    returning the reloaded path means the building run itself primes
    exactly the caches every later warm run hits (measured: priming the
    jit(fn) path instead left the next run paying a full ~7-min
    XLA+Mosaic compile per mega-kernel). Export failure (e.g. a custom
    call the exporter refuses) degrades to plain jit: slower next
    process, never wrong."""
    from jax import export as jexp
    jfn = jax.jit(fn)
    try:
        specs = jax.tree_util.tree_map(jax.api_util.shaped_abstractify, args)
        exp = jexp.export(jfn)(*specs)
        blob = exp.serialize()
        os.makedirs(_CACHE_DIR, exist_ok=True)
        path = _entry_path(name, args)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    except Exception as e:
        import warnings
        warnings.warn(f"aot: export of {name!r} failed ({e!r:.200}); "
                      "falling back to plain jit")
        return jfn
    hit = load(name, args)
    return hit if hit is not None else jfn


def get(name: str, fn, args):
    """load() or build(): a callable with `fn`'s semantics at exactly
    this arg signature. Cached-hit calls skip Python tracing entirely."""
    hit = load(name, args)
    if hit is not None:
        return hit
    return build(name, fn, args)


def shaped(name: str, fn):
    """Drop-in replacement for module-level ``jax.jit(fn)`` with a
    per-argument-signature AOT cache behind it. On CPU (tests, virtual
    meshes) this is exactly jax.jit — no blobs written, no export
    overhead; on accelerators each new signature loads its exported
    blob if present, else traces once and persists it."""
    jfn = jax.jit(fn)
    cache = {}

    def call(*args):
        if jax.devices()[0].platform == "cpu":
            return jfn(*args)
        sig = _abstract_sig(args)
        hit = cache.get(sig)
        if hit is None:
            hit = cache[sig] = get(name, fn, args)
        return hit(*args)

    call.__name__ = f"aot_{name}"
    call.__wrapped__ = fn
    return call
