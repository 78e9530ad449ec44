"""Deferred aggregation e2e: guest DEFER syscall (ECALL a7=8) + discharge
proof. Reference analog: verify-stark deferral
(/root/reference/crates/types/circuit/src/lib.rs:147-153,
crates/prover/src/prover/mod.rs:200-282)."""

import os

import numpy as np
import pytest

# The full deferred e2e proves 2 fibonacci children + a 20-instance parent
# VM machine + a wire-circuit discharge node (~10 min on the 2-core CI
# host) — heavy tier, like the recursion aggregation e2e. The deferral
# CHIP itself is covered fast and ungated in test_vm (defer syscall
# constraints/digest) and the codec in test_deferral.
pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_HEAVY"),
    reason="deferred-aggregation e2e is the heavy tier; set RUN_HEAVY=1",
)

from zkvm_prover_tpu.host.deferred import (
    DeferredAggApp,
    DeferredProver,
    verify_deferred,
)
from zkvm_prover_tpu.host.prover import Prover, ProverConfig
from zkvm_prover_tpu.host.task import ProvingTask
from zkvm_prover_tpu.host.verifier import UniversalVerifier
from zkvm_prover_tpu.stark.config import fast_test_config


@pytest.fixture(scope="module")
def children():
    cfg = ProverConfig(app_name="fibonacci", stark=fast_test_config())
    prover = Prover.setup(cfg)
    return [
        prover.gen_proof_stark(
            ProvingTask(identifier=f"defer-child-{i}",
                        serialized_witness=[b'{"log_n": 5}'])
        )
        for i in range(2)
    ]


@pytest.fixture(scope="module")
def deferred_proof(children):
    return DeferredProver(fast_test_config()).prove(
        children, identifier="defer-e2e")


def test_deferred_roundtrip(deferred_proof):
    assert verify_deferred(deferred_proof, fast_test_config())
    # the universal verifier routes deferred envelopes automatically
    assert UniversalVerifier.verify_stark_proof_with_vk(
        DeferredAggApp().vk_bytes(), deferred_proof, fast_test_config()
    )
    # envelope codec roundtrip keeps the discharge
    d = deferred_proof.to_dict()
    from zkvm_prover_tpu.host.proof_types import StarkProof

    back = StarkProof.from_dict(d)
    assert back.deferral_discharge == deferred_proof.deferral_discharge
    assert verify_deferred(back, fast_test_config())


def test_deferred_tampered_discharge_rejected(deferred_proof):
    import copy

    bad = copy.deepcopy(deferred_proof)
    raw = bytearray(bad.deferral_discharge)
    raw[len(raw) // 2] ^= 1
    bad.deferral_discharge = bytes(raw)
    assert not verify_deferred(bad, fast_test_config())


def test_deferred_tampered_child_record_rejected(deferred_proof):
    import copy

    bad = copy.deepcopy(deferred_proof)
    bad.agg_children[0].pvs = list(bad.agg_children[0].pvs)
    bad.agg_children[0].pvs[0] ^= 1
    assert not verify_deferred(bad, fast_test_config())


def test_deferred_tampered_parent_rejected(deferred_proof):
    import copy

    bad = copy.deepcopy(deferred_proof)
    raw = bytearray(bad.proof)
    raw[len(raw) // 3] ^= 1
    bad.proof = bytes(raw)
    assert not verify_deferred(bad, fast_test_config())


def test_deferred_wrong_children_rejected(deferred_proof, children):
    """Swapping the deferred child set (records + commits + discharge all
    consistently rebuilt for a DIFFERENT single child) must fail against
    the parent's deferral digest."""
    single = DeferredProver(fast_test_config()).prove(
        [children[0]], identifier="defer-one")
    import copy

    bad = copy.deepcopy(deferred_proof)
    bad.agg_children = single.agg_children
    bad.input_commits = single.input_commits
    bad.deferral_merkle_proofs = single.deferral_merkle_proofs
    bad.deferral_discharge = single.deferral_discharge
    assert not verify_deferred(bad, fast_test_config())
