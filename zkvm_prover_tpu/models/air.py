"""AIR (Algebraic Intermediate Representation) interface.

Plays the role of the reference's AIR/constraint layer (openvm's per-chip
AIRs driven through p3 `Air<AB: AirBuilder>`; SURVEY.md §2.2 "VM extension
AIRs"). The same constraint-definition code runs in two modes:

- `LdeBuilder`: values are (m,) base-field uint32 arrays over the whole LDE
  domain — the prover's fused quotient evaluation, one vectorized pass, XLA
  fuses the entire constraint polynomial into VPU code. This is the TPU
  answer to the reference's hand-written CUDA quotient kernels.
- `PointBuilder`: values are (4,) extension elements at the out-of-domain
  point zeta — the verifier's symbolic re-evaluation.

An Air subclass defines `width`, optional `num_public_values`, and
`eval(builder)`; all arithmetic goes through the builder so one definition
serves prover and verifier. Constraint degree must stay <= MAX_DEGREE = 3
(matching the reference's log_blowup = 1 budget).
"""

from __future__ import annotations

from typing import Any, List

import numpy as np
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4

MAX_DEGREE = 3
LOG_QUOTIENT_DEGREE = 1  # quotient splits into 2 chunks for degree-3 AIRs


class Air:
    """Base class for constraint systems."""

    width: int = 0
    num_public_values: int = 0
    preprocessed_width: int = 0

    def eval(self, b: "AirBuilder") -> None:
        raise NotImplementedError

    def preprocessed_trace(self):
        """Verifier-known fixed columns (e.g. a program ROM): canonical
        uint32 (n, preprocessed_width) numpy array, or None. The machine
        commits these separately; the verifier recomputes the commitment
        from this method, so the content is bound into the verification
        key rather than chosen by the prover."""
        return None

    # trace generation is AIR-specific; host-side by design (SURVEY.md §2.2:
    # "trace gen is sequential & branchy — not a TPU kernel")
    def generate_trace(self, *args, **kwargs) -> np.ndarray:
        raise NotImplementedError


class Interaction:
    """One logUp bus interaction declared by an AIR during eval().

    Mirrors the structure of openvm/plonky3 interactions (send/receive over a
    bus with a message and multiplicity; SURVEY.md §2.2 "VM extension AIRs"
    cross-chip communication). fields/mult are builder expressions.
    """

    def __init__(self, bus: int, fields, mult, is_send: bool):
        self.bus = bus
        self.fields = list(fields)
        self.mult = mult
        self.is_send = is_send


class AirBuilder:
    """Common builder API. Subclasses provide field ops + variable access."""

    def local(self, col: int):
        raise NotImplementedError

    def next(self, col: int):
        raise NotImplementedError

    def preprocessed(self, col: int):
        raise NotImplementedError

    def preprocessed_next(self, col: int):
        raise NotImplementedError

    def public_value(self, i: int):
        raise NotImplementedError

    # selectors
    @property
    def is_first_row(self):
        raise NotImplementedError

    @property
    def is_last_row(self):
        raise NotImplementedError

    @property
    def is_transition(self):
        raise NotImplementedError

    # field ops
    def add(self, a, b):
        raise NotImplementedError

    def sub(self, a, b):
        raise NotImplementedError

    def mul(self, a, b):
        raise NotImplementedError

    def constant(self, v: int):
        """Canonical integer -> field value."""
        raise NotImplementedError

    # interactions (logUp buses)
    def push_send(self, bus: int, fields, mult):
        self._interactions.append(Interaction(bus, fields, mult, True))

    def push_receive(self, bus: int, fields, mult):
        self._interactions.append(Interaction(bus, fields, mult, False))

    @property
    def interactions(self):
        return self._interactions

    # constraint registration
    def assert_zero(self, expr):
        self._constraints.append(expr)

    def assert_eq(self, a, b):
        self.assert_zero(self.sub(a, b))

    def assert_bool(self, a):
        self.assert_zero(self.mul(a, self.sub(a, self.constant(1))))

    def when(self, condition):
        return _Filtered(self, condition)

    def when_first_row(self):
        return _Filtered(self, self.is_first_row)

    def when_last_row(self):
        return _Filtered(self, self.is_last_row)

    def when_transition(self):
        return _Filtered(self, self.is_transition)


class _Filtered:
    """builder.when(c).assert_zero(e) registers c * e."""

    def __init__(self, b: AirBuilder, condition):
        self.b = b
        self.condition = condition

    def assert_zero(self, expr):
        self.b.assert_zero(self.b.mul(self.condition, expr))

    def assert_eq(self, a, bb_):
        self.assert_zero(self.b.sub(a, bb_))

    def assert_bool(self, a):
        self.assert_zero(self.b.mul(a, self.b.sub(a, self.b.constant(1))))


class LdeBuilder(AirBuilder):
    """Vectorized evaluation over the LDE domain (prover quotient pass).

    local/next are (m,) uint32 Montgomery arrays per column; selectors are
    (m,) arrays precomputed from the domain structure.
    """

    def __init__(self, lde, blowup: int, sels, public_values, pre_lde=None):
        # lde: (m, w); next-row = roll by blowup in natural order.
        # numpy inputs stay numpy (host-eval fast path), jax stays jax.
        xp = bb._mod(lde)
        self._lde = lde
        self._next = xp.roll(lde, -blowup, axis=0)
        self._pre = pre_lde
        self._pre_next = (
            None if pre_lde is None else xp.roll(pre_lde, -blowup, axis=0)
        )
        self._sels = sels  # dict: first, last, transition -> (m,) arrays
        self._pvs = public_values  # (n_pv,) Montgomery array
        self._constraints: List[Any] = []
        self._interactions: List[Interaction] = []

    def local(self, col):
        return self._lde[:, col]

    def next(self, col):
        return self._next[:, col]

    def preprocessed(self, col):
        return self._pre[:, col]

    def preprocessed_next(self, col):
        return self._pre_next[:, col]

    def public_value(self, i):
        return self._pvs[i]

    @property
    def is_first_row(self):
        return self._sels["first"]

    @property
    def is_last_row(self):
        return self._sels["last"]

    @property
    def is_transition(self):
        return self._sels["transition"]

    def add(self, a, b):
        return bb.add(a, b)

    def sub(self, a, b):
        return bb.sub(a, b)

    def mul(self, a, b):
        return bb.mul(a, b)

    def constant(self, v):
        return np.uint32(bb.to_monty_int(int(v) % bb.P))

    @property
    def constraints(self):
        return self._constraints


class PointBuilder(AirBuilder):
    """Extension-field evaluation at one out-of-domain point (verifier)."""

    def __init__(self, local_ext, next_ext, sels_ext, public_values,
                 pre_ext=None, pre_next_ext=None):
        # local_ext/next_ext: (w, 4) arrays; sels_ext: dict -> (4,) ext values
        self._local = local_ext
        self._next = next_ext
        self._pre = pre_ext
        self._pre_next = pre_next_ext
        self._sels = sels_ext
        self._pvs = public_values
        self._constraints: List[Any] = []
        self._interactions: List[Interaction] = []

    def local(self, col):
        return self._local[col]

    def next(self, col):
        return self._next[col]

    def preprocessed(self, col):
        return self._pre[col]

    def preprocessed_next(self, col):
        return self._pre_next[col]

    def public_value(self, i):
        return ext4.from_base(np.asarray(self._pvs[i], dtype=np.uint32))

    @property
    def is_first_row(self):
        return self._sels["first"]

    @property
    def is_last_row(self):
        return self._sels["last"]

    @property
    def is_transition(self):
        return self._sels["transition"]

    def add(self, a, b):
        return ext4.add(self._up(a), self._up(b))

    def sub(self, a, b):
        return ext4.sub(self._up(a), self._up(b))

    def mul(self, a, b):
        return ext4.mul(self._up(a), self._up(b))

    def constant(self, v):
        return ext4.from_ints([int(v) % bb.P, 0, 0, 0])

    @staticmethod
    def _up(x):
        xp = bb._mod(x)
        x = xp.asarray(x, dtype=xp.uint32)
        if x.ndim == 0:
            return ext4.from_base(x)
        return x

    @property
    def constraints(self):
        return self._constraints


class TraceBuilder(LdeBuilder):
    """Evaluation over the raw trace domain H (blowup 1) — used to extract
    interaction field/multiplicity vectors for logUp permutation-trace
    generation. Selectors are exact 0/1 indicator rows."""

    def __init__(self, trace_m, public_values, pre_m=None):
        n = int(trace_m.shape[0])
        first = np.zeros(n, dtype=np.uint32)
        first[0] = bb.ONE
        last = np.zeros(n, dtype=np.uint32)
        last[-1] = bb.ONE
        transition = np.full(n, bb.ONE, dtype=np.uint32)
        transition[-1] = 0
        xp = np if isinstance(trace_m, bb._NP_TYPES) else jnp
        sels = {
            "first": xp.asarray(first),
            "last": xp.asarray(last),
            "transition": xp.asarray(transition),
        }
        super().__init__(trace_m, 1, sels, public_values, pre_lde=pre_m)
