"""Batched circomlib-compatible Poseidon hash over BN254-Fr on TPU.

Replaces the reference's `poseidon-rs` dependency (used at
/root/reference/src/lib.rs:59,332-333,369-370,400-401 with 5 Fr inputs,
i.e. a t=6 permutation). Poseidon-v1 schedule: RF=8 full rounds + RP
partial rounds (x^5 S-box on the full state / state[0] only), each round
ark -> sbox -> MDS mix, output state[0]; initial state prepends a zero.

TPU design notes:
  * state layout (16, t, *batch): limb-major, t rides a batch dim so each
    field op processes the whole state at once.
  * the MDS mix uses the lazy-reduction `Fp.dot`: t^2 limb products summed
    in column space, ONE Montgomery reduction per output element.
  * partial rounds run the S-box on a (16, 1, *batch) slice only.
  * constants are generated once per t by the Grain LFSR (ops/grain.py),
    converted to Montgomery limb form, and baked into the jitted graph.

Supports t = 2..17 (inputs 1..16); the reference's poseidon-rs only ships
constants up to t = 17 as well.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from . import grain
from ..utils import hostmath as H

fq = F.fq()
_u32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def _mds_mont_ints(t: int):
    """MDS matrix as Montgomery-domain ints for the band matmul mix."""
    _, m = grain.poseidon_params(t)
    return tuple(tuple(F.FQ_SPEC.to_mont_int(m[i][j]) for j in range(t))
                 for i in range(t))


@functools.lru_cache(maxsize=None)
def _device_constants(t: int):
    """(C, M) in Montgomery limb form: C (nrounds, t, 16), M (t, t, 16)."""
    c, m = grain.poseidon_params(t)
    nrounds = grain.N_ROUNDS_F + grain.N_ROUNDS_P[t - 2]
    cm = np.zeros((nrounds, t, F.NLIMB), dtype=np.uint32)
    for r in range(nrounds):
        for i in range(t):
            cm[r, i] = F.int_to_limbs(F.FQ_SPEC.to_mont_int(c[r * t + i]))
    mm = np.zeros((t, t, F.NLIMB), dtype=np.uint32)
    for i in range(t):
        for j in range(t):
            mm[i, j] = F.int_to_limbs(F.FQ_SPEC.to_mont_int(m[i][j]))
    return cm, mm


def _x5(x: jnp.ndarray) -> jnp.ndarray:
    x2 = fq.sq(x)
    return fq.mul(fq.sq(x2), x)


def permutation(state: jnp.ndarray, t: int) -> jnp.ndarray:
    """Full Poseidon permutation on state (16, t, *batch), Montgomery domain."""
    cm, mm = _device_constants(t)
    rf = grain.N_ROUNDS_F
    rp = grain.N_ROUNDS_P[t - 2]
    # constants with limbs leading: (nrounds, 16, t, 1...) for broadcasting
    c_dev = jnp.asarray(np.transpose(cm, (0, 2, 1)), dtype=_u32)
    c_dev = c_dev.reshape(c_dev.shape[:3] + (1,) * (state.ndim - 2))
    # MDS with limbs leading: (16, t_out, t_in)
    m_dev = jnp.asarray(np.transpose(mm, (2, 0, 1)), dtype=_u32)
    m_dev = m_dev.reshape((F.NLIMB, t, t) + (1,) * (state.ndim - 2))

    mds_ints = _mds_mont_ints(t)

    def mix(s):
        # out[:, i] = sum_j M[i, j] * s[:, j]: one banded int8 MXU matmul
        # over (t*64, t*32) with a single Montgomery reduction per output
        # element (Fp.const_matmul). Requires a flat batch.
        if s.ndim == 3:
            return fq.const_matmul(mds_ints, s)
        # non-flat batch fallback: lazy-reduction dot
        chunks = []
        for lo in range(0, t, 8):
            hi = min(lo + 8, t)
            a2 = jnp.swapaxes(m_dev[:, :, lo:hi], 1, 2)  # (16, kin, t_out, 1..)
            b2 = s[:, lo:hi, None]                       # (16, kin, 1, *b)
            chunks.append(fq.dot(a2, b2, k=hi - lo))     # (16, t_out, *b)
        out = chunks[0]
        for h in chunks[1:]:
            out = fq.add(out, h)
        return out

    def full_round(r, s):
        s = fq.add(s, c_dev[r])
        s = _x5(s)
        return mix(s)

    def partial_round(r, s):
        s = fq.add(s, c_dev[r])
        head = _x5(s[:, :1])
        s = jnp.concatenate([head, s[:, 1:]], axis=1)
        return mix(s)

    def body(r, s):
        is_full = jnp.logical_or(r < rf // 2, r >= rf // 2 + rp)
        return jax.lax.cond(is_full, lambda x: full_round(r, x),
                            lambda x: partial_round(r, x), s)

    return jax.lax.fori_loop(0, rf + rp, body, state)


def hash_mont(inputs: jnp.ndarray) -> jnp.ndarray:
    """Poseidon hash of (16, nin, *batch) Montgomery inputs -> (16, *batch).

    nin = t - 1 field elements per lane; initial state [0, inputs...].
    """
    nin = inputs.shape[1]
    t = nin + 1
    if not 1 <= nin <= 16:
        raise ValueError("poseidon supports 1..16 inputs")
    if (inputs.ndim == 3 and inputs.shape[2] % F._PALLAS_TILE == 0
            and F._pallas_enabled()):
        # fused 13-bit-limb kernel: whole permutation in one pallas call
        from .pallas import fast13 as FK13
        return FK13.poseidon_fused13(inputs)
    batch_shape = inputs.shape[2:]
    flat = inputs.reshape(F.NLIMB, nin, -1) if batch_shape else \
        inputs.reshape(F.NLIMB, nin, 1)
    zero = fq.zeros((1, flat.shape[2]))
    state = jnp.concatenate([zero, flat], axis=1)
    out = permutation(state, t)[:, 0]
    return out.reshape((F.NLIMB,) + batch_shape)


# ---------------------------------------------------------------------------
# Host ground truth (python ints) for tests
# ---------------------------------------------------------------------------

def hash_host(inputs: list) -> int:
    """Exact integer Poseidon, same constants; parity model for tests."""
    p = H.Q
    t = len(inputs) + 1
    c, m = grain.poseidon_params(t)
    rf = grain.N_ROUNDS_F
    rp = grain.N_ROUNDS_P[t - 2]
    state = [0] + [x % p for x in inputs]
    for r in range(rf + rp):
        state = [(s + c[r * t + i]) % p for i, s in enumerate(state)]
        if r < rf // 2 or r >= rf // 2 + rp:
            state = [pow(s, 5, p) for s in state]
        else:
            state[0] = pow(state[0], 5, p)
        state = [sum(m[i][j] * state[j] for j in range(t)) % p
                 for i in range(t)]
    return state[0]
