"""Host aggregation API: verifier-in-circuit recursion tree.

Round-3 replacement of the round-2 digest-only scaffold: aggregation nodes
are now wire-circuit machine proofs that VERIFY their children inside the
constraint system (`zkvm_prover_tpu.recursion.aggregation`), so a node
proof implies child validity with no host pre-check. Reference analog:
in-guest `verify_stark` (/root/reference/crates/types/circuit/src/
lib.rs:138-154) + `AggregationTreeConfig { leaf: 4, internal: 3 }`
(crates/prover/src/prover/mod.rs:47-60).

This module re-exports the recursion-layer API under the host namespace and
keeps the host-facing names stable.
"""

from ..recursion.aggregation import (  # noqa: F401
    TAG_INPUT_COMMIT,
    TAG_INTERNAL,
    TAG_LEAF,
    AggNodeProgram,
    AggNodeProof,
    AggregationTreeConfig,
    ChildSlot,
    RecursiveAggregationProver,
    build_child_verification,
    digest_bytes,
    input_commit,
    machine_vk_bytes,
    machine_vk_words,
    node_digest_words,
    verification_digest_of,
)

AggregationProver = RecursiveAggregationProver
