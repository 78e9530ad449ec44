"""Scroll circuit apps: chunk/batch/bundle proving tasks through the host
Prover.

Each app runs the corresponding circuit program (zkvm_prover_tpu.circuits)
to derive the PI hash, and binds the revealed 32 bytes into a machine proof
via `PublicValuesAir`. Until the rv32 chipset covers the guest programs'
full instruction needs (ROADMAP Phase 4), the witness *computation* is a
host-trusted stand-in — exactly the reference integration harness's
"fake proof commitments" execute-tier (SURVEY.md §4) — while the proof
plumbing (tasks, envelopes, aggregation inputs, caches, vk guards) is the
production path.
"""

from __future__ import annotations

import numpy as np

from ..circuits.batch_circuit import BatchCircuit, BatchCircuitWitness
from ..circuits.bundle_circuit import BundleCircuit
from ..circuits.chunk_circuit import ChunkCircuit
from ..models.air import Air, AirBuilder
from ..ops.keccak import keccak256
from ..stark.machine import AirInstance
from .app import CircuitApp, register_app
from .task import ProvingTask


class PublicValuesAir(Air):
    """Binds 32 revealed bytes into the proof: row 0 holds the bytes as
    columns, constrained equal to the public values.

    Stand-in for in-VM reveal (openvm reveal_bytes32); the *computation*
    producing the bytes is proven once the guest programs run on the rv32
    chipset.
    """

    width = 32
    num_public_values = 32

    def eval(self, b: AirBuilder) -> None:
        for i in range(32):
            b.when_first_row().assert_eq(b.local(i), b.public_value(i))

    @staticmethod
    def trace_for(pi_hash: bytes) -> np.ndarray:
        assert len(pi_hash) == 32
        t = np.zeros((4, 32), dtype=np.uint32)
        t[0, :] = np.frombuffer(pi_hash, dtype=np.uint8)
        return t


class _ScrollCircuitApp(CircuitApp):
    circuit = None  # subclass sets

    def airs(self):
        return [PublicValuesAir()]

    def _witness_from_task(self, task: ProvingTask):
        raise NotImplementedError

    def execute(self, task: ProvingTask):
        witness = self._witness_from_task(task)
        pi_hash = self.circuit.pi_hash(witness)
        pvs = [int(b) for b in pi_hash]
        return (
            [AirInstance(PublicValuesAir(), PublicValuesAir.trace_for(pi_hash), pvs)],
            pi_hash,
        )

    def pi_hash_from_meta(self, metas) -> bytes:
        (_, _, pvs) = metas[0]
        return bytes(v & 0xFF for v in pvs)


class ChunkApp(_ScrollCircuitApp):
    name = "chunk"
    circuit = ChunkCircuit

    def _witness_from_task(self, task: ProvingTask):
        return ChunkCircuit.deserialize_witness(task.serialized_witness[0])


class BatchApp(_ScrollCircuitApp):
    name = "batch"
    circuit = BatchCircuit

    def _witness_from_task(self, task: ProvingTask):
        import pickle

        inner, chunk_proofs = pickle.loads(task.serialized_witness[0])
        return BatchCircuitWitness(inner=inner, chunk_proofs=chunk_proofs)


class BundleApp(_ScrollCircuitApp):
    name = "bundle"
    circuit = BundleCircuit

    def _witness_from_task(self, task: ProvingTask):
        import pickle

        return pickle.loads(task.serialized_witness[0])


for _cls in (ChunkApp, BatchApp, BundleApp):
    register_app(_cls)
