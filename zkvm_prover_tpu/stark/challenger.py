"""Duplex-sponge Fiat–Shamir challenger over BabyBear (Poseidon2 width 16).

Mirrors the structure of the reference's `p3-challenger` DuplexChallenger
(rate 8) used by openvm-stark-backend (SURVEY.md §2.2 "Fiat-Shamir duplex
challenger"): observe absorbs field elements into an input buffer, flushing
through the permutation at rate boundaries; sample duplexes and drains an
output buffer. Proof-of-work grinding vectorizes the nonce search as a
batched permutation sweep on device — the TPU-native replacement for the
reference's rayon grind.

The challenger itself is host-sequenced (it interleaves with host decisions),
holding tiny (16,) device arrays; all heavy use (PoW) is batched.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb
from ..ops import poseidon2 as p2

WIDTH = p2.WIDTH
RATE = p2.RATE


class Challenger:
    def __init__(self):
        self.state = np.zeros(WIDTH, dtype=np.uint32)  # Montgomery form
        self.input_buffer: list[int] = []   # Montgomery u32 values
        self.output_buffer: list[int] = []

    def clone(self) -> "Challenger":
        c = Challenger()
        c.state = self.state.copy()
        c.input_buffer = list(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        return c

    # -- absorb ----------------------------------------------------------
    def observe(self, value):
        """Observe one Montgomery-form u32 field element (int or 0-d array)."""
        self.output_buffer.clear()
        self.input_buffer.append(int(value))
        if len(self.input_buffer) == RATE:
            self._duplex()

    def observe_slice(self, values):
        for v in np.asarray(values, dtype=np.uint32).reshape(-1):
            self.observe(v)

    def observe_ext(self, ext_value):
        self.observe_slice(np.asarray(ext_value, dtype=np.uint32).reshape(-1))

    def observe_canonical_u32(self, value: int):
        self.observe(bb.to_monty_int(int(value) % bb.P))

    # -- squeeze ---------------------------------------------------------
    def _duplex(self):
        for i, v in enumerate(self.input_buffer):
            self.state[i] = v
        self.input_buffer.clear()
        out = p2.permute_np(self.state[None, :])[0]  # host permutation
        self.state = out
        self.output_buffer = [int(x) for x in out[:RATE]]

    def sample(self) -> int:
        """One Montgomery-form field element."""
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def sample_ext(self) -> np.ndarray:
        """One extension-field element, shape (4,) Montgomery (numpy, so
        host-side consumers stay on the numpy fast path; jitted consumers
        upload it once per proof)."""
        return np.array([self.sample() for _ in range(4)], dtype=np.uint32)

    def sample_bits(self, bits: int) -> int:
        v = bb.from_monty_int(self.sample())
        return v & ((1 << bits) - 1)

    # -- proof of work ---------------------------------------------------
    def grind(self, bits: int, batch: int = 1 << 14) -> int:
        """Find nonce n (canonical u32) s.t. clone().observe(n).sample_bits(bits)
        == 0. Vectorized: each batch evaluates `batch` candidate sponges with
        one batched Poseidon2 sweep."""
        if bits == 0:
            return 0
        base = self.clone()
        # Candidate nonce n: state after observe(n) has input_buffer + [n];
        # sample duplexes. Simulate vectorized.
        prefix = np.asarray(base.input_buffer, dtype=np.uint32)
        start = 0
        while True:
            nonces = np.arange(start, start + batch, dtype=np.uint64)
            nonces = nonces[nonces < bb.P].astype(np.uint32)
            states = np.broadcast_to(base.state, (len(nonces), WIDTH)).copy()
            k = len(prefix)
            if k:
                states[:, :k] = prefix
            # pure numpy: a jnp round-trip here runs on whatever platform
            # jax initialised (on axon, a tunnel transfer + compile per
            # shape) even though grinding is strictly host work
            states[:, k] = np.asarray(bb.to_monty(nonces))
            out = p2.permute_np(states)
            # sample() pops from the END of the first RATE outputs
            v = np.asarray(bb.from_monty(out[:, RATE - 1].copy()))
            hit = np.nonzero((v & ((1 << bits) - 1)) == 0)[0]
            if len(hit):
                nonce = int(nonces[hit[0]])
                self.observe_canonical_u32(nonce)
                check = self.sample_bits(bits)
                assert check == 0, "grind bookkeeping diverged"
                return nonce
            start += batch

    def check_witness(self, bits: int, nonce: int) -> bool:
        self.observe_canonical_u32(nonce)
        return self.sample_bits(bits) == 0
