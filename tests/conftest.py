"""Test harness config: CPU backend with 8 virtual devices.

Multi-chip sharding paths (mesh + shard_map + collectives) are exercised on a
virtual 8-device CPU mesh, mirroring how the reference's CI runs its full
suite on plain runners (/root/reference/.github/workflows/test.yml).

BJJ_TPU_TESTS=1 leaves the platform on the real TPU instead — use it ONLY
with tests/test_fast13_kernels.py (kernel plumbing on hardware); the mesh
tests need the 8 virtual CPU devices and will fail on a 1-chip platform.
"""

import os

_TPU_RUN = bool(os.environ.get("BJJ_TPU_TESTS"))

# Must run before the first backend initialization. Note: this container's
# sitecustomize pre-imports jax and pins jax_platforms to the axon TPU, so
# the env var alone is not enough — override the config explicitly too.
_flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_RUN and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _TPU_RUN:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-scan graphs constant-fold slowly on
# first compile; cache them across test runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
