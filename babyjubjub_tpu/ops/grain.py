"""Poseidon round-constant / MDS generation via the Grain LFSR procedure.

The reference consumes circomlib-compatible Poseidon through the
`poseidon-rs` crate (/root/reference/Cargo.toml:22, used at
/root/reference/src/lib.rs:59,332-333,369-370,400-401). The constants in
that crate were produced by the Poseidon reference `generate_parameters_grain`
procedure (Grain LFSR, GF(p) field, x^5 S-box, M=128) — regenerated here from
the published algorithm and pinned by known-answer tests (circomlib hash
vectors + the reference's EdDSA signature vectors, lib.rs:689-738).

Poseidon-v1 (circomlib) round schedule: RF = 8 full rounds, RP partial
rounds from the table below, indexed by t-2.
"""

from __future__ import annotations

import functools

from ..utils import hostmath as H

# circomlib N_ROUNDS_P table for t = 2..17
N_ROUNDS_P = [56, 57, 56, 60, 60, 63, 64, 63, 60, 66, 60, 65, 70, 60, 64, 68]
N_ROUNDS_F = 8


class _GrainLFSR:
    """80-bit Grain LFSR bitstream with the Poseidon init sequence."""

    def __init__(self, field_tag: int, sbox_tag: int, n: int, t: int,
                 r_f: int, r_p: int):
        bits = []
        for value, width in ((field_tag, 2), (sbox_tag, 4), (n, 12), (t, 12),
                             (r_f, 10), (r_p, 10)):
            bits.extend(int(b) for b in format(value, f"0{width}b"))
        bits.extend([1] * 30)
        assert len(bits) == 80
        self.state = bits
        for _ in range(160):
            self._raw_bit()

    def _raw_bit(self) -> int:
        s = self.state
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        self.state = s[1:] + [new]
        return new

    def bit(self) -> int:
        # rejection pairing: emit second bit of a pair iff first bit is 1
        while True:
            b1 = self._raw_bit()
            b2 = self._raw_bit()
            if b1:
                return b2

    def field_element(self, n_bits: int, p: int) -> int:
        """n_bits-bit sample with mod-p rejection (round constants)."""
        while True:
            v = 0
            for _ in range(n_bits):
                v = (v << 1) | self.bit()
            if v < p:
                return v

    def field_element_norej(self, n_bits: int, p: int) -> int:
        """n_bits-bit sample reduced mod p (MDS xs/ys use no rejection)."""
        v = 0
        for _ in range(n_bits):
            v = (v << 1) | self.bit()
        return v % p


@functools.lru_cache(maxsize=None)
def poseidon_params(t: int, p: int = H.Q, n_bits: int = 254,
                    r_f: int = N_ROUNDS_F, r_p: int | None = None):
    """Returns (C, M): round constants (len t*(RF+RP)) and t x t MDS matrix."""
    if r_p is None:
        r_p = N_ROUNDS_P[t - 2]
    # Round constants: field tag 1 (GF(p)), sbox tag 0 (x^alpha), with
    # mod-p rejection sampling. The MDS Cauchy points xs/ys CONTINUE the
    # same bitstream, without rejection. Both choices are pinned by the
    # circomlib KATs poseidon([1]) and poseidon([1,2]) in tests.
    g = _GrainLFSR(1, 0, n_bits, t, r_f, r_p)
    c = [g.field_element(n_bits, p) for _ in range(t * (r_f + r_p))]
    xs = [g.field_element_norej(n_bits, p) for _ in range(t)]
    ys = [g.field_element_norej(n_bits, p) for _ in range(t)]
    # M[i][j] = 1/(xs[i] + ys[j]); mix is state'[i] = sum_j M[i][j]*state[j]
    m = [[pow((xs[i] + ys[j]) % p, p - 2, p) for j in range(t)]
         for i in range(t)]
    return c, m
