from .proof_types import EvmProof, ProofEnum, StarkProof, StarkProofStat
from .task import ProvingTask
from .prover import Prover, ProverConfig
from .verifier import UniversalVerifier

__all__ = [
    "EvmProof",
    "ProofEnum",
    "StarkProof",
    "StarkProofStat",
    "ProvingTask",
    "Prover",
    "ProverConfig",
    "UniversalVerifier",
]
