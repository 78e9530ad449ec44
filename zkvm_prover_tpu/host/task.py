"""Universal proving task (parity with reference crates/types/src/task.rs:7-23
and the ProvingTask trait at crates/prover/src/task/mod.rs:8-20)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from .proof_types import StarkProof


@dataclass
class ProvingTask:
    serialized_witness: List[bytes]
    aggregated_proofs: List[StarkProof] = field(default_factory=list)
    fork_name: str = "galileo"
    vk: bytes = b""
    identifier: str = ""
    input_commits: List[bytes] = field(default_factory=list)  # 32-byte each

    def build_guest_input(self) -> List[bytes]:
        """Concatenated guest stdin stream: witness blobs then input commits
        (task/mod.rs:27-38)."""
        stream = list(self.serialized_witness)
        if self.input_commits:
            stream.append(b"".join(self.input_commits))
        return stream
