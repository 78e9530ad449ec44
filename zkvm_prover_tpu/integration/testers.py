"""Integration harness: chained task generators + prove/verify with a disk
proof cache (parity with the reference's testers/task generators at
/root/reference/crates/integration/src/{lib.rs:518-586, testers/*.rs}:
lazily build chained witnesses — rolling msg-queue hash, parent batch hash —
and memoize proofs keyed by task identifier; OUTPUT_DIR-style resumability).
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

from ..circuits.batch_circuit import BatchCircuit
from ..circuits.chunk_circuit import ChunkCircuit
from ..fields import bls12_381 as bls
from ..host import scroll_apps  # noqa: F401 (registers apps)
from ..host.prover import Prover, ProverConfig
from ..host.task import ProvingTask
from ..host.verifier import UniversalVerifier
from ..ops.keccak import keccak256
from ..stark.config import StarkConfig, fast_test_config
from ..types.base import AggregationInput, ForkName, Version
from ..types.batch import (
    BatchHeaderV7,
    BatchWitness,
    BlobPolynomial,
    EnvelopeV7,
    PayloadV7,
    PointEvalWitness,
    kzg_to_versioned_hash,
)
from ..types.batch import blob as blob_mod
from ..types.bundle import BundleWitness
from ..types.chunk.witness import BlockExecutionSummary, ChunkWitness


def output_dir() -> Path:
    """OUTPUT_DIR-resumable run directory (lib.rs:156-178 analog)."""
    d = Path(os.environ.get("OUTPUT_DIR", ".output/run"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def prove_verify(prover: Prover, task: ProvingTask, stark: StarkConfig):
    """gen_proof + independent verification (lib.rs:518-586 analog)."""
    proof = prover.gen_proof_universal(task)
    ok = UniversalVerifier.verify_stark_proof_with_vk(
        prover.get_app_vk(), proof, stark
    )
    assert ok, "independent verification failed"
    return proof


@dataclass
class ChunkTaskGenerator:
    """Builds chained chunk witnesses and memoizes proofs."""

    version: Version = field(default_factory=Version.galileo_v2)
    stark: StarkConfig = field(default_factory=fast_test_config)
    blocks_per_chunk: int = 2
    chain_id: int = 534352
    _state: Dict = field(default_factory=dict)
    _proofs: Dict[int, object] = field(default_factory=dict)
    _witnesses: Dict[int, ChunkWitness] = field(default_factory=dict)

    def __post_init__(self):
        self._state.setdefault("state_root", b"\x01" * 32)
        self._state.setdefault("msg_queue", b"\x00" * 32)
        self._state.setdefault("block", 100)
        self.prover = Prover.setup(
            ProverConfig(
                app_name="chunk",
                cache_dir=str(output_dir() / "chunk" / "proofs"),
                stark=self.stark,
            )
        )

    def witness(self, i: int) -> ChunkWitness:
        while len(self._witnesses) <= i:
            j = len(self._witnesses)
            blocks = []
            state = self._state["state_root"]
            n0 = self._state["block"]
            for k in range(self.blocks_per_chunk):
                n = n0 + k
                state = keccak256(state + b"s")
                blocks.append(
                    BlockExecutionSummary(
                        number=n,
                        timestamp=1_700_000_000 + n,
                        base_fee_per_gas=1000,
                        gas_limit=30_000_000,
                        gas_used=500_000,
                        state_root_after=state,
                        block_hash=keccak256(b"bh" + n.to_bytes(8, "big")),
                        encoded_l2_txs=[b"\x02" + bytes([n % 251]) * 16],
                        l1_msg_hashes=[],
                        num_txs=1,
                    )
                )
            w = ChunkWitness(
                version=self.version.as_version_byte(),
                blocks=blocks,
                prev_msg_queue_hash=self._state["msg_queue"],
                fork_name=self.version.fork,
                prev_state_root=self._state["state_root"],
                withdraw_root=b"\x07" * 32,
                chain_id=self.chain_id,
            )
            info, _ = ChunkCircuit.validate(w)
            self._state["state_root"] = info.post_state_root
            self._state["msg_queue"] = info.post_msg_queue_hash
            self._state["block"] = n0 + self.blocks_per_chunk
            self._witnesses[j] = w
        return self._witnesses[i]

    def get_or_build_proof(self, i: int):
        if i not in self._proofs:
            w = self.witness(i)
            task = ProvingTask(
                serialized_witness=[ChunkCircuit.serialize_witness(w)],
                fork_name=w.fork_name.value,
                identifier=f"chunk-{i}",
                vk=self.prover.get_app_vk(),
            )
            self._proofs[i] = prove_verify(self.prover, task, self.stark)
        return self._proofs[i]


@dataclass
class BatchTaskGenerator:
    chunks: ChunkTaskGenerator
    chunks_per_batch: int = 2
    kzg_setup: Optional[bls.InsecureKzgSetup] = None
    _proofs: Dict[int, object] = field(default_factory=dict)
    _infos: Dict[int, object] = field(default_factory=dict)
    _state: Dict = field(default_factory=dict)

    def __post_init__(self):
        self.kzg_setup = self.kzg_setup or bls.InsecureKzgSetup.generate(
            tau=0x7E57
        )
        BatchCircuit.tau_g2_override = self.kzg_setup.tau_g2
        self._state.setdefault("parent_batch_hash", b"\x09" * 32)
        self.version = self.chunks.version
        self.prover = Prover.setup(
            ProverConfig(
                app_name="batch",
                cache_dir=str(output_dir() / "batch" / "proofs"),
                stark=self.chunks.stark,
                # test tier runs the host-verified engine; the in-circuit
                # engine is exercised end-to-end by test_prover_aggregation
                child_verification="host",
            )
        )

    def witness_and_children(self, i: int):
        idx0 = i * self.chunks_per_batch
        chunk_ids = list(range(idx0, idx0 + self.chunks_per_batch))
        infos = []
        child_proofs = []
        for ci in chunk_ids:
            w = self.chunks.witness(ci)
            info, _ = ChunkCircuit.validate(w)
            infos.append(info)
            proof = self.chunks.get_or_build_proof(ci)
            child_proofs.append(
                AggregationInput.from_pi_hash(bytes(proof.user_pvs_proof))
            )
        version = self.version
        payload = PayloadV7(
            version=int(version.stf_version),
            prev_msg_queue_hash=infos[0].prev_msg_queue_hash,
            post_msg_queue_hash=infos[-1].post_msg_queue_hash,
            initial_block_number=infos[0].initial_block_number,
            num_blocks=sum(len(ci.block_ctxs) for ci in infos),
            block_contexts=[c for ci in infos for c in ci.block_ctxs],
            tx_data=b"".join(
                tx
                for ci_id in chunk_ids
                for b in self.chunks.witness(ci_id).blocks
                for tx in b.encoded_l2_txs
            ),
        )
        env = EnvelopeV7.build(
            int(version.stf_version), payload.to_bytes(), encode=True
        )
        blob = BlobPolynomial(env.envelope_bytes)
        commitment = blob_mod.commit_blob(self.kzg_setup, blob)
        versioned_hash = kzg_to_versioned_hash(
            bls.g1_to_compressed_be(commitment)
        )
        header = BatchHeaderV7(
            version=int(version.stf_version),
            batch_index=i,
            parent_batch_hash=self._state["parent_batch_hash"],
            blob_versioned_hash=versioned_hash,
        )
        z, _y = blob.evaluate(env.challenge_digest(versioned_hash))
        _, kproof = blob_mod.prove_blob_eval(self.kzg_setup, blob, z)
        inner = BatchWitness(
            version=version.as_version_byte(),
            chunk_infos=infos,
            blob_bytes=env.envelope_bytes.rstrip(b"\x00"),
            header=header,
            point_eval_witness=PointEvalWitness(
                kzg_commitment_x=commitment[0].to_bytes(48, "big"),
                kzg_commitment_y=commitment[1].to_bytes(48, "big"),
                kzg_proof_x=kproof[0].to_bytes(48, "big"),
                kzg_proof_y=kproof[1].to_bytes(48, "big"),
            ),
        )
        return inner, child_proofs, header

    def get_or_build_proof(self, i: int):
        if i not in self._proofs:
            inner, child_proofs, header = self.witness_and_children(i)
            task = ProvingTask(
                serialized_witness=[pickle.dumps((inner, child_proofs))],
                aggregated_proofs=[
                    self.chunks.get_or_build_proof(
                        i * self.chunks_per_batch + k
                    )
                    for k in range(self.chunks_per_batch)
                ],
                fork_name=self.version.fork.value,
                identifier=f"batch-{i}",
                vk=self.prover.get_app_vk(),
            )
            proof = prove_verify(self.prover, task, self.chunks.stark)
            self._proofs[i] = proof
            from ..circuits.batch_circuit import BatchCircuitWitness

            info, _ = BatchCircuit.validate(
                BatchCircuitWitness(inner=inner, chunk_proofs=child_proofs)
            )
            self._infos[i] = info
            self._state["parent_batch_hash"] = header.batch_hash()
        return self._proofs[i]


@dataclass
class BundleTaskGenerator:
    batches: BatchTaskGenerator
    batches_per_bundle: int = 2

    def build_proof(self):
        infos = []
        agg = []
        aggregated = []
        for i in range(self.batches_per_bundle):
            proof = self.batches.get_or_build_proof(i)
            aggregated.append(proof)
            agg.append(
                AggregationInput.from_pi_hash(bytes(proof.user_pvs_proof))
            )
            infos.append(self.batches._infos[i])
        witness = BundleWitness(
            version=self.batches.version.as_version_byte(),
            batch_proofs=agg,
            batch_infos=infos,
            fork_name=self.batches.version.fork,
        )
        prover = Prover.setup(
            ProverConfig(
                app_name="bundle",
                cache_dir=str(output_dir() / "bundle" / "proofs"),
                stark=self.batches.chunks.stark,
                child_verification="host",
            )
        )
        task = ProvingTask(
            serialized_witness=[pickle.dumps(witness)],
            aggregated_proofs=aggregated,
            fork_name=witness.fork_name.value,
            identifier="bundle-0",
            vk=prover.get_app_vk(),
        )
        return prove_verify(prover, task, self.batches.chunks.stark)
