"""Anatomy of one public-API batch call through the relay (VERDICT r4
weak #3): where does verify_batch_async's dispatch() actually block?

Phases timed separately at B lanes:
  marshal   — host bytes -> packed numpy rows (no device)
  put       — jax.device_put of the packed buffer (H2D through relay)
  dispatch  — the jitted core call returning device futures
  fetch     — np.asarray of the result (compute + D2H + sync)

Then three loop disciplines over R batches:
  sync      — full verify_batch per batch (the e2e metric)
  async     — dispatch all R first, then finish all (current *_async)
  double    — dispatch i+1 before finish(i) (depth-2 pipeline)

If `put` dominates and is synchronous under the relay, overlap can at
best hide compute+fetch, bounding the pipelined speedup at
(marshal+put+compute)/(marshal+put) — print that bound next to the
measured ratios so ROOFLINE.md can state whether the >=1.5x target is
link-possible at all.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import random

from babyjubjub_tpu.models import eddsa
from babyjubjub_tpu.ops import field as F, curve as C
from babyjubjub_tpu.utils import hostmath as H

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
R = int(sys.argv[2]) if len(sys.argv) > 2 else 6

rng = random.Random(0xA57)
nk = 8
ks = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(nk)]
msgs = [rng.randrange(H.Q) for _ in range(B)]
keys_b = [ks[i % nk] for i in range(B)]
pks = eddsa.public_batch(ks)
pks_b = [pks[i % nk] for i in range(B)]
sigs = eddsa.sign_batch(keys_b, msgs)
print("setup done", flush=True)

# ---- phase anatomy -------------------------------------------------------
n = B
pad = eddsa._pad_to(n)


def marshal():
    return eddsa._packed(
        [eddsa._coord_rows([sig[0][0] for sig in sigs]),
         eddsa._coord_rows([sig[0][1] for sig in sigs]),
         eddsa._coord_rows([pk[0] for pk in pks_b]),
         eddsa._coord_rows([pk[1] for pk in pks_b]),
         F.ints_to_byte_rows([sig[1] for sig in sigs]),
         F.ints_to_byte_rows([m % H.Q for m in msgs])], n, pad)


# warm everything once
packed = marshal()
dev = jax.device_put(packed)
out = eddsa._verify_core_packed(dev)
np.asarray(out)

for name, fn in (
        ("marshal", marshal),
        ("put", lambda: jax.device_put(packed)),
        ("put_sync", lambda: jax.block_until_ready(jax.device_put(packed))),
        ("dispatch", lambda: eddsa._verify_core_packed(dev)),
        ("fetch", lambda: np.asarray(eddsa._verify_core_packed(dev))),
):
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:9s} {1e3 * best:8.1f} ms", flush=True)

# ---- loop disciplines ----------------------------------------------------

def timed(label, loop):
    loop()  # warm
    t0 = time.perf_counter()
    loop()
    dt = (time.perf_counter() - t0) / R
    print(f"{label:7s} {B / dt:10.1f} verifies/s   ({1e3 * dt:.1f} ms/batch)",
          flush=True)
    return dt


def sync_loop():
    for _ in range(R):
        eddsa.verify_batch(pks_b, sigs, msgs)


def async_loop():
    fins = [eddsa.verify_batch_async(pks_b, sigs, msgs) for _ in range(R)]
    for f in fins:
        f()


def double_loop():
    prev = eddsa.verify_batch_async(pks_b, sigs, msgs)
    for _ in range(R - 1):
        cur = eddsa.verify_batch_async(pks_b, sigs, msgs)
        prev()
        prev = cur
    prev()


t_sync = timed("sync", sync_loop)
t_async = timed("async", async_loop)
t_double = timed("double", double_loop)
print(f"pipelined/sync speedup: async {t_sync / t_async:.2f}x, "
      f"double {t_sync / t_double:.2f}x", flush=True)
