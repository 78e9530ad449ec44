"""Constraint/bus debugging utilities (the openvm `debug_constraints`
analog — reference runs these checks inside stark-backend when proving with
debug assertions; here they are a standalone tool used by tests and during
chip bring-up).

- check_constraints: evaluate an AIR's constraints on the raw trace domain
  (blowup 1, exact selectors) and report nonzero rows per constraint.
- check_bus_balance: evaluate every AIR's interactions and verify that, for
  each bus, the multiset of sent field-tuples (weighted by multiplicity)
  equals the multiset received — the integer-level statement that the logUp
  permutation argument later proves in the field.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..fields import babybear as bb
from ..models.air import Air, TraceBuilder


def _monty(trace: np.ndarray):
    # numpy end-to-end: debug checks never touch the jax dispatcher
    return bb.to_monty(np.asarray(trace, dtype=np.uint32))


def _builder(air: Air, trace: np.ndarray, public_values=()):
    pvs_m = np.array([bb.to_monty_int(int(v) % bb.P) for v in public_values],
                     dtype=np.uint32)
    pre = air.preprocessed_trace()
    pre_m = _monty(pre) if pre is not None else None
    tb = TraceBuilder(_monty(trace), pvs_m, pre_m=pre_m)
    air.eval(tb)
    return tb


def check_constraints(air: Air, trace: np.ndarray,
                      public_values=()) -> List[Tuple[int, List[int]]]:
    """Returns [(constraint_index, [bad_row, ...])] — empty means all
    constraints vanish on the trace domain."""
    tb = _builder(air, trace, public_values)
    failures = []
    for idx, c in enumerate(tb.constraints):
        vals = bb.from_monty(np.asarray(c)) % bb.P
        vals = np.broadcast_to(vals, (trace.shape[0],))
        bad = np.nonzero(vals)[0]
        if bad.size:
            failures.append((idx, bad[:8].tolist()))
    return failures


def _canon_rows(x, n: int) -> np.ndarray:
    arr = bb.from_monty(np.asarray(x)) % bb.P
    return np.broadcast_to(arr, (n,)).astype(np.int64)


def check_bus_balance(
    pairs: Sequence[Tuple[Air, np.ndarray]],
    public_values: Dict[int, list] = None,
) -> Dict[int, List[Tuple[tuple, int]]]:
    """pairs: (air, trace). Returns {bus: [(field_tuple, net_count), ...]}
    for every unbalanced tuple — empty dict means all buses balance."""
    public_values = public_values or {}
    net: Dict[int, Dict[tuple, int]] = defaultdict(lambda: defaultdict(int))
    for i, (air, trace) in enumerate(pairs):
        n = trace.shape[0]
        tb = _builder(air, trace, public_values.get(i, ()))
        for inter in tb.interactions:
            mult = _canon_rows(inter.mult, n)
            fields = [_canon_rows(f, n) for f in inter.fields]
            sign = 1 if inter.is_send else -1
            live = np.nonzero(mult)[0]
            for r in live:
                key = tuple(int(f[r]) for f in fields)
                net[inter.bus][key] += sign * int(mult[r])
    out = {}
    for bus, d in net.items():
        bad = [(k, v) for k, v in d.items() if v % bb.P != 0]
        if bad:
            out[bus] = bad[:10]
    return out
