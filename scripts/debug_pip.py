"""Bisect the Pippenger TPU worker crash: run stages incrementally."""

import os
import secrets
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from babyjubjub_tpu.models import msm as M
from babyjubjub_tpu.ops import field as F, curve as C
from babyjubjub_tpu.utils import hostmath as H

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
stage = int(sys.argv[2]) if len(sys.argv) > 2 else 99
if len(sys.argv) > 3 and sys.argv[3] == "noker":
    F.set_pallas("off")

fq = F.fq()
base_pts = [H.mul_scalar(H.B8, secrets.randbelow(H.SUBORDER))
            for _ in range(8)]
pts = (base_pts * (B // 8 + 1))[:B]
x, y = map(jax.device_put, C.points_to_arrays(pts))
sa = jax.device_put(F.ints_to_array(
    [secrets.randbelow(H.SUBORDER) for _ in range(B)]))

digits = jax.jit(lambda s: M._window_digits(s, 8, 32))(sa)
d0 = digits[0]
print("digits ok", d0.shape, flush=True)

if stage >= 1:
    @jax.jit
    def s1(dj, x, y):
        perm = jnp.argsort(dj)
        return jnp.take(dj, perm), jnp.take(x, perm, axis=1), \
            jnp.take(y, perm, axis=1)
    ds, xs, ys = s1(d0, x, y)
    np.asarray(ds)
    print("stage1 sort+gather ok", flush=True)

if stage >= 2:
    one = fq.one_mont((B,))

    @jax.jit
    def s2(xs, ys):
        return jax.lax.associative_scan(C.add, (xs, ys, one), axis=1)
    cum = s2(xs, ys)
    np.asarray(cum[0])
    print("stage2 assoc_scan ok", flush=True)

if stage >= 3:
    @jax.jit
    def s3(dj, x, y):
        # full single-window bucket sum (mirrors window_sum)
        perm = jnp.argsort(dj)
        ds = jnp.take(dj, perm)
        xs = jnp.take(x, perm, axis=1)
        ys = jnp.take(y, perm, axis=1)
        cum = jax.lax.associative_scan(C.add, (xs, ys, one), axis=1)
        ident1 = C.identity((1,))
        cum_ext = tuple(jnp.concatenate([i1, c], axis=1)
                        for i1, c in zip(ident1, cum))
        ends = jnp.searchsorted(ds, jnp.arange(256, dtype=jnp.uint32),
                                side="right")
        top = tuple(jnp.take(c, ends[1:], axis=1) for c in cum_ext)
        bot = tuple(jnp.take(c, ends[:-1], axis=1) for c in cum_ext)
        buckets = C.add(top, M._neg_proj(bot))
        rev = tuple(c[:, ::-1] for c in buckets)
        suf = jax.lax.associative_scan(C.add, rev, axis=1)
        return M.tree_reduce_points(suf)
    w0 = s3(d0, x, y)
    np.asarray(w0[0])
    print("stage3 window_sum ok", flush=True)

if stage >= 4:
    proj = M._msm_pip_jit((x, y), sa)
    np.asarray(proj[0])
    print("stage4 full pippenger ok", flush=True)
