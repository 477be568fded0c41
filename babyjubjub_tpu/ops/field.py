"""Batched prime-field arithmetic for TPU: 16x16-bit limbs in uint32.

Design (TPU-first, not a port):
  * A field element is a uint32 array of shape ``(16, *batch)`` holding
    16-bit little-endian limbs ("limb-major" layout): the trailing batch
    dimension maps onto TPU vector lanes, the 16-limb axis onto sublanes,
    so a (16, 128) slab is exactly one native u32 VREG tile pair.
  * The batch dimension is the SIMD axis. Limb-level algorithms are plain
    sequential vector code: every "instruction" below operates on a whole
    batch vector, so there is no data-dependent control flow anywhere and
    the entire field stack is jit/vmap/shard_map-compatible by construction.
  * Products of 16-bit limbs fit exactly in uint32; column accumulators
    carry at most ~2^23 before a carry pass, so all arithmetic is exact.
  * Multiplication is Montgomery (R = 2^256): schoolbook product columns
    followed by 16 word-level Montgomery reduction steps.

This subsumes the reference's L1 (ff_ce `Fr`, Montgomery form; see
/root/reference/src/lib.rs:4-7) and L2 (BigInt helpers,
/root/reference/src/utils.rs:7-223), generalized over the modulus so the
same kernels serve Q (coordinates), SUBORDER and ORDER (scalar fields).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import hostmath

LIMB_BITS = 16
NLIMB = 16
MASK = (1 << LIMB_BITS) - 1
NBITS = LIMB_BITS * NLIMB  # 256

_u32 = jnp.uint32
_i32 = jnp.int32


# ---------------------------------------------------------------------------
# Host-side limb codecs
# ---------------------------------------------------------------------------

def int_to_limbs(x: int) -> np.ndarray:
    """Python int (< 2^256) -> (16,) uint32 of 16-bit LE limbs."""
    assert 0 <= x < (1 << NBITS)
    return np.array([(x >> (LIMB_BITS * k)) & MASK for k in range(NLIMB)],
                    dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs, dtype=np.uint64)
    return sum(int(limbs[k]) << (LIMB_BITS * k) for k in range(NLIMB))


def ints_to_array(xs, batch_shape=None) -> np.ndarray:
    """List of python ints (< 2^256) -> (16, N) uint32 limb array.

    Vectorized: one C-level ``int.to_bytes`` per element, then a single
    numpy byte->limb pass over the whole batch (the per-int Python limb
    loop was an O(B) host tax on every protocol call).
    """
    xs = xs if isinstance(xs, (list, tuple)) else list(xs)
    buf = b"".join(int(x).to_bytes(32, "little") for x in xs)
    rows = np.frombuffer(buf, dtype=np.uint8).reshape(len(xs), 32)
    out = (rows[:, 0::2].astype(np.uint32)
           | (rows[:, 1::2].astype(np.uint32) << 8)).T.copy()
    if batch_shape is not None:
        out = out.reshape((NLIMB,) + tuple(batch_shape))
    return out


def ints_to_byte_rows(xs) -> np.ndarray:
    """List of python ints (< 2^256) -> (N, 32) uint8 LE byte rows — the
    minimal wire image for host->device transfer (uint32 limb arrays are
    2x the bytes; through a relayed/PCIe link the transfer dominates the
    public-API latency, so batch entry points ship bytes and unpack into
    limbs on device via unpack_rows_dev)."""
    xs = xs if isinstance(xs, (list, tuple)) else list(xs)
    buf = b"".join(int(x).to_bytes(32, "little") for x in xs)
    return np.frombuffer(buf, dtype=np.uint8).reshape(len(xs), 32)


def byte_rows_to_ints(rows: np.ndarray) -> list:
    """(N, 32) uint8 LE byte rows -> list of python ints."""
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    buf = rows.tobytes()
    return [int.from_bytes(buf[32 * i:32 * (i + 1)], "little")
            for i in range(rows.shape[0])]


def unpack_rows_dev(rows: jnp.ndarray) -> jnp.ndarray:
    """Device: (32, *batch) uint8 LE bytes -> (16, *batch) u32 limbs."""
    r = rows.astype(_u32)
    return r[0::2] | (r[1::2] << 8)


def pack_limbs_dev(limbs: jnp.ndarray) -> jnp.ndarray:
    """Device: (16, *batch) canonical u32 limbs -> (32, *batch) uint8 LE
    bytes (half the device->host bytes of a u32 limb array)."""
    lo = (limbs & 0xFF).astype(jnp.uint8)
    hi = ((limbs >> 8) & 0xFF).astype(jnp.uint8)
    return jnp.stack([lo, hi], axis=1).reshape((2 * NLIMB,) + limbs.shape[1:])


def array_to_ints(arr) -> list:
    """(16, N) canonical 16-bit limbs -> list of python ints (vectorized:
    one numpy limb->byte pass, then C-level ``int.from_bytes`` per row)."""
    arr = np.asarray(arr, dtype=np.uint32).reshape(NLIMB, -1).T  # (N, 16)
    rows = np.empty((arr.shape[0], 32), dtype=np.uint8)
    rows[:, 0::2] = arr & 0xFF
    rows[:, 1::2] = (arr >> 8) & 0xFF
    buf = rows.tobytes()
    return [int.from_bytes(buf[32 * i:32 * (i + 1)], "little")
            for i in range(arr.shape[0])]


# ---------------------------------------------------------------------------
# FieldSpec: host-side constants for one modulus
# ---------------------------------------------------------------------------

class FieldSpec:
    """Precomputed Montgomery constants for a modulus p < 2^255."""

    def __init__(self, p: int, name: str):
        assert 2 * p < (1 << NBITS), "need 2p < R for single conditional subtract"
        self.p = p
        self.name = name
        self.R = 1 << NBITS
        self.p_limbs = int_to_limbs(p)
        self.half_p = int_to_limbs(p >> 1)          # for sign convention x > p>>1
        if p % 2 == 1:
            self.r_mod_p = self.R % p
            self.r2 = (self.R * self.R) % p
            # ninv = -p^{-1} mod 2^16 (word-level Montgomery constant)
            self.ninv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
            self.r2_limbs = int_to_limbs(self.r2)
            self.one_mont = int_to_limbs(self.r_mod_p)  # to_mont(1)
        else:
            # Even modulus (e.g. the full group ORDER = 8*l): Montgomery is
            # unavailable; only the additive ring ops (add/sub/double) are
            # supported, which is all the protocol needs mod ORDER.
            self.r_mod_p = self.r2 = self.ninv = None
            self.r2_limbs = self.one_mont = None

    # host codecs -----------------------------------------------------------
    def to_mont_int(self, x: int) -> int:
        return (x * self.R) % self.p

    def from_mont_int(self, x: int) -> int:
        return (x * pow(self.R, -1, self.p)) % self.p


FQ_SPEC = FieldSpec(hostmath.Q, "fq")             # coordinate field
FL_SPEC = FieldSpec(hostmath.SUBORDER, "fl")      # prime subgroup scalar field
FO_SPEC = FieldSpec(hostmath.ORDER, "fo")         # full group order (8*l)


# ---------------------------------------------------------------------------
# Device ops
# ---------------------------------------------------------------------------

def _bc(c: np.ndarray, ndim: int) -> jnp.ndarray:
    """Broadcast a (16,) constant against a (16, *batch) operand."""
    return jnp.asarray(c, dtype=_u32).reshape((NLIMB,) + (1,) * (ndim - 1))


# Pallas kernels only on real accelerator backends; the CPU test backend
# uses the portable XLA limb-scan path. Overridable for A/B benchmarking.
_PALLAS_TILE = 512
_PALLAS_MODE = "auto"  # "auto" | "on" | "off"


def set_pallas(mode: str):
    global _PALLAS_MODE
    assert mode in ("auto", "on", "off")
    _PALLAS_MODE = mode


@functools.lru_cache(maxsize=None)
def _default_backend_is_accel() -> bool:
    return jax.default_backend() not in ("cpu",)


def _pallas_enabled() -> bool:
    if _PALLAS_MODE == "on":
        return True
    if _PALLAS_MODE == "off":
        return False
    return _default_backend_is_accel()


class Fp:
    """Batched field ops over one FieldSpec. All methods are pure/jittable.

    Elements are uint32 (16, *batch) arrays with canonical (< p) 16-bit
    limbs. Montgomery-domain values are used for mul-heavy pipelines; the
    domain is a caller-side convention (`to_mont` / `from_mont`).
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self._p = spec.p_limbs
        self._one_raw = int_to_limbs(1)
        if spec.ninv is not None:
            self._r2 = spec.r2_limbs
            self._one_mont = spec.one_mont
            self._ninv = np.uint32(spec.ninv)
            # exponent bit tables (LSB-first) for fixed-exponent powers
            self._inv_exp_bits = self._exp_bits(spec.p - 2)

    @staticmethod
    def _exp_bits(e: int) -> np.ndarray:
        nb = max(e.bit_length(), 1)
        return np.array([(e >> i) & 1 for i in range(nb)], dtype=np.uint32)

    # -- constants ----------------------------------------------------------
    def zeros(self, batch_shape) -> jnp.ndarray:
        return jnp.zeros((NLIMB,) + tuple(batch_shape), dtype=_u32)

    def const(self, x: int, batch_shape=(), mont: bool = True) -> jnp.ndarray:
        v = self.spec.to_mont_int(x) if mont else x % self.spec.p
        c = jnp.asarray(int_to_limbs(v), dtype=_u32)
        return jnp.broadcast_to(
            c.reshape((NLIMB,) + (1,) * len(tuple(batch_shape))),
            (NLIMB,) + tuple(batch_shape))

    def one_mont(self, batch_shape) -> jnp.ndarray:
        return self.const(1, batch_shape, mont=True)

    # -- carry plumbing ------------------------------------------------------
    # All limb-sequential passes are lax.scan loops so the HLO stays tiny
    # (this matters: fully unrolled limb code blows the point-add graph to
    # ~18k ops and XLA compile time to minutes on the CPU backend).
    # `unroll` trades HLO size against loop overhead; FULL_UNROLL switches
    # to straight-line limb code (faster on TPU, pathological to compile on
    # single-core CPU with constant inputs).
    _UNROLL = 4
    FULL_UNROLL = False

    @classmethod
    def _carry_propagate(cls, cols: jnp.ndarray) -> jnp.ndarray:
        """Normalize 16 u32 columns (< 2^31 each) to canonical 16-bit limbs.

        The final carry out of limb 15 must be zero by the caller's bounds.
        """
        if cls.FULL_UNROLL:
            out = []
            c = jnp.zeros_like(cols[0])
            for k in range(NLIMB):
                v = cols[k] + c
                out.append(v & MASK)
                c = v >> LIMB_BITS
            return jnp.stack(out)

        def body(c, col):
            v = col + c
            return v >> LIMB_BITS, v & MASK

        _, out = jax.lax.scan(body, jnp.zeros_like(cols[0]), cols,
                              unroll=cls._UNROLL)
        return out

    def _cond_sub_p(self, a: jnp.ndarray) -> jnp.ndarray:
        """a (canonical limbs, value < 2p) -> a mod p."""
        p = jnp.broadcast_to(_bc(self._p, a.ndim), a.shape).astype(_i32)

        if self.FULL_UNROLL:
            outs = []
            borrow = jnp.zeros(a.shape[1:], dtype=_i32)
            for k in range(NLIMB):
                d = a[k].astype(_i32) - p[k] - borrow
                outs.append((d & MASK).astype(_u32))
                borrow = (d < 0).astype(_i32)
            diff = jnp.stack(outs)
            return jnp.where((borrow == 0)[None], diff, a)

        def body(borrow, xs):
            ak, pk = xs
            d = ak.astype(_i32) - pk - borrow
            return (d < 0).astype(_i32), (d & MASK).astype(_u32)

        borrow, diff = jax.lax.scan(
            body, jnp.zeros(a.shape[1:], dtype=_i32), (a, p),
            unroll=self._UNROLL)
        return jnp.where((borrow == 0)[None], diff, a)

    def reduce_full(self, a: jnp.ndarray) -> jnp.ndarray:
        """a mod p for ANY 256-bit limb value (canonical limbs, a < 2^256):
        k conditional subtractions with k = floor((2^256 - 1) / p) — k = 5
        for the curve-order ring (ORDER > 2^253), k = 1 for fq/fl."""
        k = ((1 << NBITS) - 1) // self.spec.p
        for _ in range(k):
            a = self._cond_sub_p(a)
        return a

    # -- ring ops ------------------------------------------------------------
    def _pallas_flat(self, a, b):
        """(af, bf, shape) when the pallas elementwise path applies, else None."""
        if not _pallas_enabled():
            return None
        sh = jnp.broadcast_shapes(a.shape, b.shape)
        n = 1
        for d in sh[1:]:
            n *= d
        if n % _PALLAS_TILE != 0:
            return None
        return (jnp.broadcast_to(a, sh).reshape(NLIMB, n),
                jnp.broadcast_to(b, sh).reshape(NLIMB, n), sh)

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        flat = self._pallas_flat(a, b)
        if flat is not None:
            from .pallas import mulmod as _mk
            af, bf, sh = flat
            return _mk.addmod_spec(af, bf, self.spec,
                                   tile=_PALLAS_TILE).reshape(sh)
        s = self._carry_propagate(a + b)
        return self._cond_sub_p(s)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        flat = self._pallas_flat(a, b)
        if flat is not None:
            from .pallas import mulmod as _mk
            af, bf, sh = flat
            return _mk.submod_spec(af, bf, self.spec,
                                   tile=_PALLAS_TILE).reshape(sh)
        p = _bc(self._p, a.ndim)
        # a + (p - b): both < p so result in [1, 2p)
        cols = a.astype(_i32) + p.astype(_i32) - b.astype(_i32)

        def body(c, col):
            v = col + c
            return v >> LIMB_BITS, (v & MASK).astype(_u32)  # arithmetic shift borrow

        _, s = jax.lax.scan(body, jnp.zeros(a.shape[1:], dtype=_i32), cols,
                            unroll=self._UNROLL)
        return self._cond_sub_p(s)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(self.zeros(a.shape[1:]), a)

    def _prod_columns(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Schoolbook product columns of a*b: (32, *batch) u32, cols < 2^21."""
        a = jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, b.shape))
        b = jnp.broadcast_to(b, a.shape)
        bsh = a.shape[1:]

        if self.FULL_UNROLL:
            t = [jnp.zeros(bsh, dtype=_u32) for _ in range(2 * NLIMB)]
            for i in range(NLIMB):
                prod = a[i][None] * b
                lo = prod & MASK
                hi = prod >> LIMB_BITS
                for j in range(NLIMB):
                    t[i + j] = t[i + j] + lo[j]
                    t[i + j + 1] = t[i + j + 1] + hi[j]
            return jnp.stack(t)

        idx = jnp.arange(NLIMB, dtype=jnp.int32)
        acc0 = jnp.zeros((2 * NLIMB,) + bsh, dtype=_u32)

        def prod_body(acc, xs):
            ai, i = xs
            prod = ai[None] * b
            seg = jax.lax.dynamic_slice_in_dim(acc, i, NLIMB + 1, axis=0)
            seg = seg.at[:NLIMB].add(prod & MASK)
            seg = seg.at[1:].add(prod >> LIMB_BITS)
            return jax.lax.dynamic_update_slice_in_dim(acc, seg, i, axis=0), None

        acc, _ = jax.lax.scan(prod_body, acc0, (a, idx))
        return acc

    def _mont_reduce(self, acc: jnp.ndarray, n_sub: int = 1) -> jnp.ndarray:
        """Word-level Montgomery reduction of 32 product columns -> 16 limbs.

        `n_sub`: number of conditional-subtract passes; 1 suffices for a
        single product (result < 2p), lazy sums of k products need
        ceil(log2(k/2)) + 1 (see `dot`).
        """
        q = jnp.broadcast_to(_bc(self._p, acc.ndim), (NLIMB,) + acc.shape[1:])
        ninv = _u32(self._ninv)

        if self.FULL_UNROLL:
            t = [acc[i] for i in range(2 * NLIMB)]
            for i in range(NLIMB):
                t[i + 1] = t[i + 1] + (t[i] >> LIMB_BITS)
                ti = t[i] & MASK
                m = (ti * ninv) & MASK
                prod = m[None] * q
                lo = prod & MASK
                hi = prod >> LIMB_BITS
                t[i] = ti + lo[0]
                for j in range(1, NLIMB):
                    t[i + j] = t[i + j] + lo[j]
                for j in range(NLIMB):
                    t[i + j + 1] = t[i + j + 1] + hi[j]
                t[i + 1] = t[i + 1] + (t[i] >> LIMB_BITS)
            res = jnp.stack(t[NLIMB:2 * NLIMB])
            res = self._carry_propagate(res)
            for _ in range(n_sub):
                res = self._cond_sub_p(res)
            return res

        idx = jnp.arange(NLIMB, dtype=jnp.int32)

        def red_body(acc, i):
            seg = jax.lax.dynamic_slice_in_dim(acc, i, NLIMB + 1, axis=0)
            t0 = seg[0]
            seg = seg.at[1].add(t0 >> LIMB_BITS)
            t0 = t0 & MASK
            m = (t0 * ninv) & MASK
            prod = m[None] * q
            seg = seg.at[0].set(t0 + (prod[0] & MASK))
            seg = seg.at[1:NLIMB].add(prod[1:] & MASK)
            seg = seg.at[1:].add(prod >> LIMB_BITS)
            seg = seg.at[1].add(seg[0] >> LIMB_BITS)  # column i is dead after this
            return jax.lax.dynamic_update_slice_in_dim(acc, seg, i, axis=0), None

        acc, _ = jax.lax.scan(red_body, acc, idx)

        res = acc[NLIMB:2 * NLIMB]
        res = self._carry_propagate(res)
        for _ in range(n_sub):
            res = self._cond_sub_p(res)
        return res

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product a*b*R^-1 mod p.

        Inputs: canonical limbs; a may be any value < R, b must be < p
        (bound: result < 2p needs a*b/R + p < 2p, i.e. a*b < R*p).
        Exactness: limb products < 2^32 in u32; column accumulators < 2^23.

        On TPU backends, batches whose flattened size is a multiple of the
        kernel tile route through the Pallas mulmod kernel (~20x the XLA
        limb-scan path); other shapes and CPU fall back to the scans.
        """
        if _pallas_enabled() and self.spec.ninv is not None:
            sh = jnp.broadcast_shapes(a.shape, b.shape)
            n = 1
            for d in sh[1:]:
                n *= d
            if n % _PALLAS_TILE == 0:
                from .pallas import mulmod as _mk
                af = jnp.broadcast_to(a, sh).reshape(NLIMB, n)
                bf = jnp.broadcast_to(b, sh).reshape(NLIMB, n)
                return _mk.mulmod_spec(af, bf, self.spec,
                                       tile=_PALLAS_TILE).reshape(sh)
        return self._mont_reduce(self._prod_columns(a, b))

    def dot(self, a: jnp.ndarray, b: jnp.ndarray, k: int) -> jnp.ndarray:
        """Lazy-reduction dot product: sum_j a[:, j] * b[:, j] (mod p).

        a, b: (16, k, *batch) canonical limbs, all values < p; the k partial
        products are summed in column space and reduced ONCE — the classic
        Poseidon-MDS optimization (saves k-1 Montgomery reductions).
        Requires k <= 8 so the reduced value p*(k/4 + 1) stays below 2^256
        (the 16-limb carry-propagate capacity); callers chunk larger sums.
        """
        assert k <= 8
        cols = self._prod_columns(a, b)          # (32, k, *batch)
        cols = jnp.sum(cols, axis=1)             # (32, *batch) < k*2^21
        # result < p * (k*p/R + 1) <= p * (k/4 + 1) since p < R/4
        n_sub = max(1, -(-k // 4))
        return self._mont_reduce(cols, n_sub=n_sub)

    # -- constant-matrix x vector products (MXU band trick) -------------------
    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _band_big(m_rows: tuple):
        """Banded int8 matrix for out[i] = sum_j m[i][j] * s[j] over Fp.

        Entry layout: BIG[i*64 + kb, j*32 + b] = byte_{kb-b}(m[i][j]) - 128.
        Returns (BIG int8, consts int32 (t_out*64,)).
        """
        t_out = len(m_rows)
        t_in = len(m_rows[0])
        big = np.zeros((t_out * 64, t_in * 32), dtype=np.int64)
        for i in range(t_out):
            for j in range(t_in):
                c = int(m_rows[i][j])
                for kb in range(64):
                    for b in range(32):
                        sh = kb - b
                        if sh >= 0:
                            big[i * 64 + kb, j * 32 + b] = (c >> (8 * sh)) & 0xFF
        consts = (128 * big.sum(axis=1)
                  - 128 * 128 * t_in * 32).astype(np.int32)
        return (big - 128).astype(np.int8), consts

    def const_matmul(self, m_rows: tuple, s: jnp.ndarray) -> jnp.ndarray:
        """out[:, i, B] = sum_j m_rows[i][j] * s[:, j, B] (mod p), Montgomery.

        m_rows: tuple-of-tuples of Montgomery-domain python ints (t_out,
        t_in); s: (16, t_in, B) canonical Montgomery limbs. The multiply
        runs as ONE int8 MXU matmul over a banded constant matrix (offset
        -128 with exact correction); only the per-output Montgomery
        reduction runs on the VPU (Pallas kernel when available).
        Used by the Poseidon MDS mix.
        """
        t_out = len(m_rows)
        t_in = len(m_rows[0])
        if t_in > 8:
            # regroup bound (2^31.6) only holds for <= 8 input elements;
            # chunk the contraction and add the partial results mod p.
            out = None
            for lo_j in range(0, t_in, 8):
                hi_j = min(lo_j + 8, t_in)
                part = self.const_matmul(
                    tuple(r[lo_j:hi_j] for r in m_rows), s[:, lo_j:hi_j])
                out = part if out is None else self.add(out, part)
            return out
        b = s.shape[-1]
        big, consts = Fp._band_big(tuple(tuple(int(v) for v in r)
                                         for r in m_rows))
        # state bytes with -128 offset: (t_in*32, B) int8
        lo = (s & 0xFF).astype(_i32)
        hi = ((s >> 8) & 0xFF).astype(_i32)
        s_total = jnp.sum(lo + hi, axis=(0, 1))              # (B,)
        x8 = jnp.stack([lo, hi], axis=2)                     # (16, t_in, 2, B)
        x8 = jnp.transpose(x8, (1, 0, 2, 3)).reshape(t_in * 32, b)
        x8 = (x8 - 128).astype(jnp.int8)
        dot = jax.lax.dot_general(jnp.asarray(big), x8,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=_i32)
        cols8 = dot + (128 * s_total)[None] + jnp.asarray(consts)[:, None]
        cols8 = cols8.reshape(t_out, 64, b)
        # regroup byte-stride -> 16-bit-stride u32 columns (< 2^31.6)
        cols16 = (cols8[:, 0::2] + (cols8[:, 1::2] << 8)).astype(_u32)
        acc = jnp.transpose(cols16, (1, 0, 2))               # (32, t_out, B)
        n_sub = max(1, -(-t_in // 4))
        if _pallas_enabled() and (t_out * b) % _PALLAS_TILE == 0:
            from .pallas import mulmod as _mk
            flat = acc.reshape(2 * NLIMB, t_out * b)
            red = _mk.reduce_spec(flat, self.spec, n_sub=n_sub,
                                  tile=_PALLAS_TILE)
            return red.reshape(NLIMB, t_out, b)
        return self._mont_reduce(acc, n_sub=n_sub)

    def sq(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    # -- Montgomery domain ----------------------------------------------------
    def to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        """Canonical int limbs (any value < R) -> Montgomery domain mod p."""
        return self.mul(a, _bc(self._r2, a.ndim) + self.zeros(a.shape[1:]))

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, _bc(self._one_raw, a.ndim) + self.zeros(a.shape[1:]))

    # -- predicates ------------------------------------------------------------
    @staticmethod
    def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=0)

    @staticmethod
    def is_zero(a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=0)

    @staticmethod
    def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """cond: (*batch,) bool -> where(cond, a, b) over (16, *batch)."""
        return jnp.where(cond[None], a, b)

    def gt_half_p(self, a: jnp.ndarray) -> jnp.ndarray:
        """Sign-bit convention of the reference: a > (p >> 1)?

        (reference lib.rs:174, lib.rs:217).
        """
        h = _bc(self.spec.half_p, a.ndim)
        # lexicographic compare from most-significant limb
        gt = jnp.zeros(a.shape[1:], dtype=bool)
        decided = jnp.zeros(a.shape[1:], dtype=bool)
        for k in range(NLIMB - 1, -1, -1):
            limb_gt = a[k] > h[k]
            limb_lt = a[k] < h[k]
            gt = jnp.where(~decided & limb_gt, True, gt)
            decided = decided | limb_gt | limb_lt
        return gt

    # -- fixed-exponent powers ---------------------------------------------------
    def _pow_const(self, a: jnp.ndarray, exp_bits: np.ndarray) -> jnp.ndarray:
        """a^e (Montgomery domain) with LSB-first constant exponent bits."""
        bits = jnp.asarray(exp_bits, dtype=_u32)

        def body(i, carry):
            r, base = carry
            bit = bits[i]
            r = self.select(bit == 1, self.mul(r, base), r)
            base = self.sq(base)
            return (r, base)

        r0 = self.one_mont(a.shape[1:])
        r, _ = jax.lax.fori_loop(0, int(exp_bits.shape[0]), body, (r0, a))
        return r

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fermat inverse a^(p-2), Montgomery domain. inv(0) = 0 (masked by callers).

        Over FQ on TPU, tile-aligned flat batches route through the fused
        13-bit-limb exponentiation kernel (constant-exponent windowing,
        no selects; pallas/fast13.py)."""
        if (self.spec.p == hostmath.Q and a.ndim == 2
                and a.shape[1] % _PALLAS_TILE == 0 and _pallas_enabled()):
            from .pallas import fast13 as FK13
            return FK13.inv_fused13(a)
        return self._pow_const(a, self._inv_exp_bits)

    def pow(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        return self._pow_const(a, self._exp_bits(e))

    # -- square root (Tonelli-Shanks, fixed bound) -------------------------------
    @functools.cached_property
    def _sqrt_consts(self):
        p = self.spec.p
        m = 0
        qodd = p - 1
        while qodd % 2 == 0:
            qodd //= 2
            m += 1
        z = 2
        while pow(z, (p - 1) >> 1, p) != p - 1:
            z += 1
        g = pow(z, qodd, p)  # generator of the 2-Sylow subgroup
        return m, qodd, int_to_limbs(self.spec.to_mont_int(g))

    def sqrt(self, a: jnp.ndarray):
        """Batched Tonelli-Shanks square root, Montgomery domain.

        Replaces reference utils.rs:109-160 with a branch-free masked loop
        whose bound is the static 2-adicity of p-1 (28 for BN254-Fr, so the
        general q = 1 mod 4 branch of the reference always applies).
        Returns (root, is_qr): root^2 == a when is_qr; root arbitrary else.

        Over FQ on TPU, tile-aligned flat batches route through the fused
        13-bit-limb kernel (pallas/fast13.py).
        """
        if (self.spec.p == hostmath.Q and a.ndim == 2
                and a.shape[1] % _PALLAS_TILE == 0 and _pallas_enabled()):
            from .pallas import fast13 as FK13
            return FK13.sqrt_fused13(a)
        m, qodd, g_limbs = self._sqrt_consts
        w = self._pow_const(a, self._exp_bits((qodd - 1) // 2))
        r = self.mul(w, a)
        t = self.mul(r, w)  # a^qodd
        c = jnp.broadcast_to(_bc(g_limbs, a.ndim), a.shape)
        one = self.one_mont(a.shape[1:])
        for i in range(m - 2, -1, -1):
            d = jax.lax.fori_loop(0, i, lambda _, x: self.sq(x), t)
            flip = ~self.eq(d, one)
            r = self.select(flip, self.mul(r, c), r)
            c = self.sq(c)
            t = self.select(flip, self.mul(t, c), t)
        is_qr = self.eq(self.sq(r), a)
        return r, is_qr


@functools.lru_cache(maxsize=None)
def fq() -> Fp:
    return Fp(FQ_SPEC)


@functools.lru_cache(maxsize=None)
def fl() -> Fp:
    return Fp(FL_SPEC)


@functools.lru_cache(maxsize=None)
def fo() -> Fp:
    return Fp(FO_SPEC)
