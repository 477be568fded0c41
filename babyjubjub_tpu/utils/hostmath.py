"""Host-side (python-int) ground truth for BabyJubJub arithmetic.

This module is the CPU reference model used for:
  * generating fixed-base window tables at import time,
  * property-testing the batched TPU kernels against exact integer math,
  * the scalar/byte-level glue the reference does with num-bigint.

Behavioral parity targets (reference file:line):
  * modulus / modinv / modsqrt / legendre_symbol: /root/reference/src/utils.rs:7-223
  * curve constants:                              /root/reference/src/lib.rs:28-60
  * projective add (add-2008-bbjlp):              /root/reference/src/lib.rs:88-131
  * mul_scalar (LSB-first double-and-add):        /root/reference/src/lib.rs:149-164
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Curve constants (reference lib.rs:28-60)
# ---------------------------------------------------------------------------

# BN254 scalar-field modulus ("Q" in the reference).
Q = 21888242871839275222246405745257275088548364400416034343698204186575808495617

# Twisted Edwards coefficients: a*x^2 + y^2 = 1 + d*x^2*y^2
A_COEFF = 168700
D_COEFF = 168696

# Order of the full curve group (8 * prime subgroup order).
ORDER = 21888242871839275222246405745257275088614511777268538073601725287587578984328
# Prime subgroup order ("SUBORDER = ORDER >> 3", reference lib.rs:53-58).
SUBORDER = ORDER >> 3

# Subgroup generator B8 (reference lib.rs:37-46).
B8 = (
    5299619240641551281634865583518297030282874472190772894086521144482721001553,
    16950150798460657717958625567821834550301663161624707787222815936182638968203,
)

IDENTITY = (0, 1)


# ---------------------------------------------------------------------------
# Modular arithmetic helpers (reference utils.rs parity)
# ---------------------------------------------------------------------------

def modulus(a: int, m: int) -> int:
    """Euclidean-positive remainder (reference utils.rs:7-9)."""
    return ((a % m) + m) % m


def modinv(a: int, q: int) -> int:
    """Extended-Euclid inverse, exact mirror of reference utils.rs:11-29.

    Quirk preserved: no gcd==1 check — when gcd(a, q) != 1 this returns the
    same pseudo-inverse the reference does (pinned by the reference's own
    test vector utils.rs:229-237). Raises ValueError for a == 0.
    """
    if a == 0:
        raise ValueError("no mod inv of Zero")
    mn = (q, a)
    xy = (0, 1)
    while mn[1] != 0:
        xy = (xy[1], xy[0] - (mn[0] // mn[1]) * xy[1])
        mn = (mn[1], modulus(mn[0], mn[1]))
    x = xy[0]
    while x < 0:
        x = modulus(x, q)
    return x


def modsqrt_v2(a: int, q: int) -> int:
    """Alternative Tonelli-Shanks (reference utils.rs:164-213 parity).

    Kept, like the reference, as a cross-check implementation; tests
    assert both variants agree.
    """
    a = a % q
    if legendre_symbol(a, q) != 1 or a == 0 or q == 2:
        raise ValueError("not a mod p square")
    if q % 4 == 3:
        return pow(a, (q + 1) // 4, q)
    p = q - 1
    s = 0
    while p % 2 == 0:
        s += 1
        p >>= 1
    z = 1
    while legendre_symbol(z, q) != -1:
        z += 1
    c = pow(z, p, q)
    x = pow(a, (p + 1) >> 1, q)
    t = pow(a, p, q)
    m = s
    while t != 1:
        i = 1
        e = 2
        while i < m:
            if pow(t, e, q) == 1:
                break
            e *= 2
            i += 1
        b = pow(c, 1 << (m - i - 1), q)
        x = (x * b) % q
        t = (t * b * b) % q
        c = (b * b) % q
        m = i
    return x


def legendre_symbol(a: int, q: int) -> int:
    """1 if a is a QR mod q else -1 (reference utils.rs:215-223 semantics)."""
    ls = pow(a, (q - 1) >> 1, q)
    return -1 if ls == q - 1 else 1


def modsqrt(a: int, q: int) -> int:
    """Tonelli-Shanks square root mod prime q (reference utils.rs:109-160).

    Raises ValueError when `a` is not a quadratic residue (parity with the
    reference returning Err("not a mod p square")).
    """
    a = a % q
    if legendre_symbol(a, q) != 1 or a == 0 or q == 2:
        raise ValueError("not a mod p square")
    if q % 4 == 3:
        return pow(a, (q + 1) // 4, q)

    s = q - 1
    e = 0
    while s % 2 == 0:
        s >>= 1
        e += 1

    n = 2
    while legendre_symbol(n, q) != -1:
        n += 1

    y = pow(a, (s + 1) >> 1, q)
    b = pow(a, s, q)
    g = pow(n, s, q)
    r = e
    while True:
        t = b
        m = 0
        while t != 1:
            t = (t * t) % q
            m += 1
        if m == 0:
            return y
        t = pow(g, 1 << (r - m - 1), q)
        g = (t * t) % q
        y = (y * t) % q
        b = (b * g) % q
        r = m


# ---------------------------------------------------------------------------
# Curve group ops (exact integer model)
# ---------------------------------------------------------------------------

def point_add(p: tuple[int, int], q: tuple[int, int]) -> tuple[int, int]:
    """Affine twisted-Edwards addition (complete for BabyJubJub subgroup).

    Mathematically identical to projective add-2008-bbjlp + affine()
    (reference lib.rs:88-131, 70-85): affine outputs are unique, so this is
    bit-exact with the reference's result.
    """
    x1, y1 = p
    x2, y2 = q
    x1x2 = x1 * x2 % Q
    y1y2 = y1 * y2 % Q
    dxy = D_COEFF * x1x2 % Q * y1y2 % Q
    x3 = (x1 * y2 + y1 * x2) * modinv(1 + dxy, Q) % Q
    y3 = (y1y2 - A_COEFF * x1x2) * modinv(modulus(1 - dxy, Q), Q) % Q
    return (x3, y3)


def mul_scalar(p: tuple[int, int], n: int) -> tuple[int, int]:
    """Scalar multiplication, LSB-first double-and-add (reference lib.rs:149-164)."""
    r = IDENTITY
    e = p
    while n > 0:
        if n & 1:
            r = point_add(r, e)
        e = point_add(e, e)
        n >>= 1
    return r


def proj_add(p: tuple[int, int, int], q: tuple[int, int, int]) -> tuple[int, int, int]:
    """Projective add-2008-bbjlp on int triples mod Q — the exact formula
    the reference runs (lib.rs:88-131), with no on-curve assumption."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    a = z1 * z2 % Q
    b = a * a % Q
    c = x1 * x2 % Q
    d = y1 * y2 % Q
    e = D_COEFF * c % Q * d % Q
    f = (b - e) % Q
    g = (b + e) % Q
    x3 = a * f % Q * (((x1 + y1) * (x2 + y2) - c - d) % Q) % Q
    y3 = a * g % Q * ((d - A_COEFF * c) % Q) % Q
    z3 = f * g % Q
    return (x3, y3, z3)


def proj_affine(p: tuple[int, int, int]) -> tuple[int, int]:
    """Projective -> affine; z == 0 -> (0, 0) (reference lib.rs:70-85)."""
    x, y, z = p
    if z % Q == 0:
        return (0, 0)
    zi = pow(z, Q - 2, Q)
    return (x * zi % Q, y * zi % Q)


def mul_scalar_any(p: tuple[int, int], n: int) -> tuple[int, int]:
    """Reference-exact mul_scalar for ANY affine (x, y) — on-curve or not —
    with the scalar UNREDUCED: LSB-first double-and-add over n.bit_length()
    iterations of the raw projective formulas (lib.rs:149-164 runs the
    algebra regardless of curve membership). For on-curve points this
    agrees with mul_scalar(p, n % ORDER); off the curve the formulas do
    not form a group and reduction is NOT exact, hence this model."""
    r = (0, 1, 1)
    e = (p[0], p[1], 1)
    i = n
    while i > 0:
        if i & 1:
            r = proj_add(r, e)
        e = proj_add(e, e)
        i >>= 1
    return proj_affine(r)


def point_neg(p: tuple[int, int]) -> tuple[int, int]:
    return (modulus(-p[0], Q), p[1])


def is_on_curve(p: tuple[int, int]) -> bool:
    x, y = p
    return (A_COEFF * x * x + y * y) % Q == (1 + D_COEFF * x * x % Q * y * y) % Q
