"""Fibonacci AIR — the minimal end-to-end circuit (SURVEY.md §7 Phase 3's
"single toy AIR" milestone).

Two columns (a, b); public values [x0, x1, x_final]:
  first row:   a = x0, b = x1
  transition:  a' = b, b' = a + b
  last row:    b = x_final
"""

from __future__ import annotations

import numpy as np

from ..fields import babybear as bb
from .air import Air, AirBuilder


class FibonacciAir(Air):
    width = 2
    num_public_values = 3

    def eval(self, b: AirBuilder) -> None:
        a0 = b.local(0)
        b0 = b.local(1)
        a1 = b.next(0)
        b1 = b.next(1)

        b.when_first_row().assert_eq(a0, b.public_value(0))
        b.when_first_row().assert_eq(b0, b.public_value(1))
        b.when_transition().assert_eq(a1, b0)
        b.when_transition().assert_eq(b1, b.add(a0, b0))
        b.when_last_row().assert_eq(b0, b.public_value(2))

    def generate_trace(self, log_n: int, x0: int = 0, x1: int = 1):
        n = 1 << log_n
        trace = np.zeros((n, 2), dtype=np.uint32)
        a, b = x0 % bb.P, x1 % bb.P
        for i in range(n):
            trace[i, 0] = a
            trace[i, 1] = b
            a, b = b, (a + b) % bb.P
        pvs = [x0 % bb.P, x1 % bb.P, int(trace[n - 1, 1])]
        return trace, pvs
