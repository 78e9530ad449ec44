"""Host prover with verifier-in-circuit aggregation: a task carrying
aggregated_proofs produces a machine that verifies the children inside the
constraint system (no host pre-check), binds the digest over (child vk,
child PVs) into its public values, and exposes deferral-shaped
input_commits. Reference: crates/types/circuit/src/lib.rs:138-154 (in-guest
verify_stark) + crates/integration/src/lib.rs:461-514 (input_commits)."""

import json

import pytest

from zkvm_prover_tpu.host.prover import Prover, ProverConfig
from zkvm_prover_tpu.host.task import ProvingTask
from zkvm_prover_tpu.host.verifier import UniversalVerifier
from zkvm_prover_tpu.stark.config import StarkConfig
from zkvm_prover_tpu.stark.fri import FriConfig

TINY = StarkConfig(fri=FriConfig(log_blowup=1, num_queries=2,
                                 proof_of_work_bits=2))


def _fib_task(log_n=3, x1=1, ident=None):
    return ProvingTask(
        serialized_witness=[
            json.dumps({"log_n": log_n, "x0": 0, "x1": x1}).encode()
        ],
        identifier=ident,
    )


@pytest.fixture(scope="module")
def setup():
    child_prover = Prover.setup(ProverConfig(app_name="fibonacci",
                                             stark=TINY))
    child = child_prover.gen_proof_stark(_fib_task(x1=1))
    parent_prover = Prover.setup(ProverConfig(app_name="fib-double",
                                              stark=TINY))
    task = ProvingTask(
        serialized_witness=[
            json.dumps({"log_n_fib": 3, "log_n_dbl": 3}).encode()
        ],
        aggregated_proofs=[child],
    )
    proof = parent_prover.gen_proof_stark(task)
    return child_prover, child, parent_prover, proof


def test_aggregated_proof_roundtrip(setup):
    _cp, child, parent_prover, proof = setup
    assert len(proof.agg_children) == 1
    assert proof.agg_children[0].vk == child.baseline
    assert len(proof.input_commits) == 1
    assert UniversalVerifier.verify_stark_proof_with_vk(
        parent_prover.get_app_vk(), proof, TINY
    )


def test_envelope_serialization_carries_agg(setup):
    from zkvm_prover_tpu.host.proof_types import StarkProof

    _cp, _child, parent_prover, proof = setup
    rt = StarkProof.from_dict(json.loads(json.dumps(proof.to_dict())))
    assert rt.agg_children[0].pvs == proof.agg_children[0].pvs
    assert rt.input_commits == proof.input_commits
    assert UniversalVerifier.verify_stark_proof_with_vk(
        parent_prover.get_app_vk(), rt, TINY
    )


def test_forged_child_pvs_rejected(setup):
    """Tamper the untrusted agg_children hints: digest pin must fail."""
    import copy

    _cp, _child, parent_prover, proof = setup
    bad = copy.deepcopy(proof)
    bad.agg_children[0].pvs[0] = (bad.agg_children[0].pvs[0] + 1) % 100
    assert not UniversalVerifier.verify_stark_proof_with_vk(
        parent_prover.get_app_vk(), bad, TINY
    )


def test_invalid_child_makes_unprovable_node(setup):
    """Corrupt the child proof bytes -> the parent machine's constraints
    are unsatisfiable (checked at the constraint level; the proof-level
    version of this property is test_recursion_aggregation)."""
    from zkvm_prover_tpu.host import serialization
    from zkvm_prover_tpu.recursion.aggregation import (
        TAG_LEAF, ChildSlot, build_child_verification)
    from zkvm_prover_tpu.recursion.stark_verifier import RealOracle
    from zkvm_prover_tpu.host.app import get_app
    from zkvm_prover_tpu.stark import debug

    _cp, child, _pp, _proof = setup
    mp = serialization.decode_machine_proof(child.proof)
    ln, w, pvs = mp.meta[0]
    pvs = list(pvs)
    pvs[2] = (pvs[2] + 3) % 1000
    mp.meta[0] = (ln, w, pvs)

    app = get_app("fibonacci")
    slot = ChildSlot(app.airs(), [ln for (ln, _, _) in mp.meta], TINY)
    instances = build_child_verification(TAG_LEAF, [slot],
                                         [RealOracle(mp)])
    ok = True
    for inst in instances:
        if debug.check_constraints(inst.air, inst.trace,
                                   inst.public_values):
            ok = False
    pairs = [(i.air, i.trace) for i in instances]
    pvs_map = {k: i.public_values for k, i in enumerate(instances)}
    if debug.check_bus_balance(pairs, pvs_map):
        ok = False
    assert not ok, "tampered child must not satisfy the node circuit"


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_HEAVY"),
    reason="in-circuit aggregation over a real VM chunk proof is the "
           "heavy tier (RUN_HEAVY=1, >35 min on the 2-core CI host: the "
           "wire-circuit verifier machine over a 17-AIR child is large "
           "even at the tiny FRI config); exercises airs_for_meta child "
           "slots with witness-dependent keccak table heights",
)
def test_in_circuit_aggregation_over_vm_chunk_proof(tmp_path):
    """ADVICE r3 follow-up: the production default (in-circuit child
    verification) over a chunk proof whose KeccakfAir height comes from
    the witness, not the app default."""
    from zkvm_prover_tpu.integration.testers import ChunkTaskGenerator

    gen = ChunkTaskGenerator(stark=TINY)
    chunk_proof = gen.get_or_build_proof(0)

    parent = Prover.setup(ProverConfig(app_name="fib-double", stark=TINY))
    task = ProvingTask(
        serialized_witness=[
            json.dumps({"log_n_fib": 3, "log_n_dbl": 3}).encode()
        ],
        aggregated_proofs=[chunk_proof],
    )
    proof = parent.gen_proof_stark(task)
    assert proof.agg_children[0].vk == chunk_proof.baseline
    assert UniversalVerifier.verify_stark_proof_with_vk(
        parent.get_app_vk(), proof, TINY
    )
    # corrupt one byte of the child proof body -> node unprovable
    import copy

    bad_child = copy.deepcopy(chunk_proof)
    body = bytearray(bad_child.proof)
    body[len(body) // 2] ^= 1
    bad_child.proof = bytes(body)
    bad_task = ProvingTask(
        serialized_witness=[
            json.dumps({"log_n_fib": 3, "log_n_dbl": 3}).encode()
        ],
        aggregated_proofs=[bad_child],
    )
    with pytest.raises(Exception):
        parent.gen_proof_stark(bad_task)
