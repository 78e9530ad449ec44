"""Host-side (python-int) BabyBear quartic-extension arithmetic.

Verifier-side helper: openings are tiny (O(queries) values), so the verifier
recomputes folds/constraints with exact bignum arithmetic — no device work.
Canonical (non-Montgomery) representation: tuples/lists/np arrays of 4 ints.
"""

from __future__ import annotations

import numpy as np

from ..fields import babybear as bb
from ..fields.ext4 import W_INT

P = bb.P


def add(a, b):
    return [(int(a[i]) + int(b[i])) % P for i in range(4)]


def sub(a, b):
    return [(int(a[i]) - int(b[i])) % P for i in range(4)]


def mul(a, b):
    c = [0] * 7
    for i in range(4):
        for j in range(4):
            c[i + j] += int(a[i]) * int(b[j])
    for k in range(6, 3, -1):
        c[k - 4] += W_INT * c[k]
    return [v % P for v in c[:4]]


def scale(a, s: int):
    return [(int(a[i]) * int(s)) % P for i in range(4)]


def from_base(x: int):
    return [int(x) % P, 0, 0, 0]


def exp(a, e: int):
    result = from_base(1)
    base = list(map(int, a))
    while e > 0:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def inv(a):
    """Inverse via conjugate product: a^{-1} = prod(frobenius) / norm."""
    dth = pow(W_INT, (P - 1) // 4, P)

    def frob(x, k):
        r = pow(dth, k, P)
        acc = 1
        out = []
        for i in range(4):
            out.append((int(x[i]) * acc) % P)
            acc = (acc * r) % P
        return out

    f1, f2, f3 = frob(a, 1), frob(a, 2), frob(a, 3)
    conj = mul(f1, mul(f2, f3))
    norm = mul(a, conj)[0]
    n_inv = pow(norm, P - 2, P)
    return scale(conj, n_inv)


def eq(a, b) -> bool:
    return all(int(a[i]) % P == int(b[i]) % P for i in range(4))


def is_zero(a) -> bool:
    return all(int(v) % P == 0 for v in a)


def powers(base, n: int):
    out = [from_base(1)]
    for _ in range(n - 1):
        out.append(mul(out[-1], base))
    return out
