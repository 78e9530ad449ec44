"""Scroll circuit apps: chunk/batch/bundle proving tasks through the host
Prover, with the PI hash computed INSIDE the rv32 VM.

Round-3 upgrade over the round-2 `PublicValuesAir` stand-in: each app now
executes the hash-reveal guest (vm/guests.py) on the native rv32 executor
and proves the full v2 machine — CPU chips, keccak syscall chips
(KeccakVmAir + KeccakfAir), program ROM, offline-checked registers/RAM,
byte/xor tables — with the witness's PI preimage entering through the hint
stream and the keccak-256 digest revealed as the proof's public values
(reference flow: crates/circuits/chunk-circuit/src/main.rs:14-29,
read -> compute -> reveal_pi_hash).

Remaining host-trusted stand-in (documented divergence, ROADMAP Phase 6):
the witness -> PI-preimage computation (block execution / DA decoding /
fold) runs host-side, exactly the reference integration harness's
execute-tier "fake proof commitments" (SURVEY.md §4). What the machine
proof now attests: the guest ROM (bound by the exe commitment) read SOME
hinted byte stream and revealed its true keccak-256 digest.
"""

from __future__ import annotations

import numpy as np

from ..circuits.batch_circuit import BatchCircuit, BatchCircuitWitness
from ..circuits.bundle_circuit import BundleCircuit
from ..circuits.chunk_circuit import ChunkCircuit
from ..models import rv32_v2
from ..models.keccak_air import KeccakfAir
from ..models.keccak_vm import KeccakVmAir
from ..models.rv32_v0 import ByteTableAir, MemoryBoundaryAir
from ..ops.keccak import keccak256
from ..stark.machine import AirInstance
from ..vm import guests
from ..vm.executor import HALTED, Rv32Executor
from .app import CircuitApp, register_app
from .task import ProvingTask

# instance order produced by rv32_v2.generate_traces for a keccak-using
# guest (fixed composition; heights vary with the witness)
KECCAKF_IDX = 9
PV_IDX = 11
N_MACHINE_AIRS = 17


class _VmHashApp(CircuitApp):
    """App whose machine is the rv32 VM running the hash-reveal guest."""

    circuit = None  # subclass sets
    MAX_CYCLES = 1 << 16

    def _witness_from_task(self, task: ProvingTask):
        raise NotImplementedError

    def program(self):
        cls = type(self)
        prog = cls.__dict__.get("_prog_cached")
        if prog is None:
            prog = guests.hash_reveal_program()
            cls._prog_cached = prog
        return prog

    def airs(self):
        return self.airs_for_meta(None)

    # cap on the claimed keccak-table height: 2^20 rows (~43k permutations)
    # is far beyond any hash-reveal guest; an unvalidated claim would let a
    # hostile envelope allocate a 2^claimed-row preprocessed trace before
    # any check fails (memory DoS).
    MAX_KECCAK_LOG_N = 20

    def airs_for_meta(self, meta):
        """AIR list matching generate_traces output order; KeccakfAir's
        preprocessed schedule depends on its height, read from `meta`.
        `meta` is untrusted — malformed shapes/heights raise ValueError
        (the host verifier maps that to a clean False)."""
        kec_log_n = 5
        if meta is not None:
            if len(meta) < N_MACHINE_AIRS:
                raise ValueError("not a VM machine proof")
            kec_log_n = int(meta[KECCAKF_IDX][0])
            if not 5 <= kec_log_n <= self.MAX_KECCAK_LOG_N:
                raise ValueError(
                    f"claimed keccak table height 2^{kec_log_n} out of "
                    f"bounds"
                )
        return [
            rv32_v2.AluAir(), rv32_v2.ShiftAir(), rv32_v2.BranchAir(),
            rv32_v2.JumpAir(), rv32_v2.LoadStoreAir(), rv32_v2.MulAir(),
            rv32_v2.DivRemAir(), rv32_v2.SystemAir(),
            KeccakVmAir(), KeccakfAir(log_n=kec_log_n),
            rv32_v2.ProgramAirV2(self.program()),
            rv32_v2.PublicValuesAir(),
            rv32_v2.ExecBoundaryAirV2(), rv32_v2.RamBoundaryAirV2(),
            MemoryBoundaryAir(), ByteTableAir(), rv32_v2.XorTableAir(),
            rv32_v2.Range16TableAir(),
        ]

    def execute(self, task: ProvingTask):
        witness = self._witness_from_task(task)
        pi, version = self.circuit.validate(witness)
        preimage = pi.pi_by_version(version)

        prog = self.program()
        ex = Rv32Executor()
        ex.load_program(prog)
        ex.set_hints(guests.hash_hints(preimage))
        state = ex.run(self.MAX_CYCLES)
        assert state == HALTED, f"guest did not halt (state={state})"
        air_traces = rv32_v2.generate_traces(
            prog, ex.records(), data_base=guests.DATA_BASE)
        instances = [AirInstance(a, t, p) for a, t, p in air_traces]

        pi_hash = b"".join(
            int(w).to_bytes(4, "little") for w in ex.public_values()
        )
        assert pi_hash == keccak256(preimage), "guest/host digest mismatch"
        return instances, pi_hash

    def pi_hash_from_meta(self, metas) -> bytes:
        (_, _, pvs) = metas[PV_IDX]
        n = rv32_v2.N_PV_WORDS
        if len(pvs) < 5 * n or list(pvs[4 * n : 5 * n]) != [1] * n:
            raise ValueError("all PV words must be revealed")
        return bytes(int(v) & 0xFF for v in pvs[: 4 * n])


class ChunkApp(_VmHashApp):
    name = "chunk"
    circuit = ChunkCircuit

    def _witness_from_task(self, task: ProvingTask):
        return ChunkCircuit.deserialize_witness(task.serialized_witness[0])


class BatchApp(_VmHashApp):
    name = "batch"
    circuit = BatchCircuit

    def _witness_from_task(self, task: ProvingTask):
        import pickle

        inner, chunk_proofs = pickle.loads(task.serialized_witness[0])
        return BatchCircuitWitness(inner=inner, chunk_proofs=chunk_proofs)


class BundleApp(_VmHashApp):
    name = "bundle"
    circuit = BundleCircuit

    def _witness_from_task(self, task: ProvingTask):
        import pickle

        return pickle.loads(task.serialized_witness[0])


for _cls in (ChunkApp, BatchApp, BundleApp):
    register_app(_cls)
