"""Worker process for the two-process jax.distributed test.

Usage: python tests/_mp_worker.py <process_id> <coordinator_port>

Each of the two processes owns 4 virtual CPU devices (global mesh = 8).
The signature is derived with the pure-host model (no device work before
jax.distributed.initialize), then batch-verified through the sharded
pipeline over the global "data" mesh axis; every process checks its
addressable output shards and prints MP_OK.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir)))

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from babyjubjub_tpu.parallel import mesh as MM  # noqa: E402

MM.initialize_distributed(coordinator_address=f"localhost:{port}",
                          num_processes=2, process_id=pid)
assert jax.process_count() == 2, "distributed init did not take"
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from babyjubjub_tpu.models import keys as K  # noqa: E402
from babyjubjub_tpu.ops import field as F, poseidon as PH  # noqa: E402
from babyjubjub_tpu.parallel import sharded  # noqa: E402
from babyjubjub_tpu.utils import hostmath as H, codec, blake512  # noqa: E402

# --- host-only signature derivation (deterministic, both processes agree)
key = bytes(range(32))
msg = 1234567890
sk = K.scalar_key(key)
h = K.blake_hash(key)
r = codec.bytes_le_to_int(
    blake512.digest(h[32:64] + msg.to_bytes(32, "little"))) % H.SUBORDER
R = H.mul_scalar(H.B8, r)
A = H.mul_scalar(H.B8, sk)
hm = PH.hash_host([R[0], R[1], A[0], A[1], msg])
s = (r + hm * (sk << 3)) % H.SUBORDER

B = 8  # one lane per global device
mesh = MM.make_mesh(8)
sh = NamedSharding(mesh, P(None, "data"))


def dev(ints):
    arr = F.ints_to_array([int(v)] * B if isinstance(ints, int)
                          else [int(v) for v in ints])
    return jax.make_array_from_process_local_data(sh, np.asarray(arr))


def dev_mont(v):
    return dev([F.FQ_SPEC.to_mont_int(v)] * B)


verify = sharded.verify_sharded(mesh)
ok = verify(dev_mont(R[0]), dev_mont(R[1]), dev_mont(A[0]), dev_mont(A[1]),
            dev([s] * B), dev([msg] * B))
local = np.concatenate([np.asarray(si.data).ravel()
                        for si in ok.addressable_shards])
assert local.all(), f"process {pid}: sharded verify False lanes: {local}"

# negative control: corrupt s -> all False
bad = verify(dev_mont(R[0]), dev_mont(R[1]), dev_mont(A[0]), dev_mont(A[1]),
             dev([s + 1] * B), dev([msg] * B))
badl = np.concatenate([np.asarray(si.data).ravel()
                       for si in bad.addressable_shards])
assert not badl.any(), f"process {pid}: corrupted sig verified: {badl}"

print(f"MP_OK pid={pid} procs={jax.process_count()} "
      f"devs={len(jax.devices())} local_devs={jax.local_device_count()}",
      flush=True)
