"""Task-level proving parallelism: independent tasks proven by a
process pool, results identical to sequential proving (SURVEY §2.3
task-parallel axis; the reference harness proves chunks concurrently)."""

import json

import pytest

from zkvm_prover_tpu.host.prover import Prover, ProverConfig
from zkvm_prover_tpu.host.task import ProvingTask
from zkvm_prover_tpu.host.verifier import UniversalVerifier
from zkvm_prover_tpu.parallel.pool import ProvingPool
from zkvm_prover_tpu.stark.config import StarkConfig, fast_test_config


def _tasks(n):
    return [
        ProvingTask(
            serialized_witness=[json.dumps(
                {"log_n": 5, "x0": i, "x1": i + 1}).encode()],
            identifier=f"pool-{i}",
        )
        for i in range(n)
    ]


def test_task_roundtrip():
    t = _tasks(1)[0]
    t2 = ProvingTask.from_dict(t.to_dict())
    assert t2.serialized_witness == t.serialized_witness
    assert t2.identifier == t.identifier


@pytest.mark.slow
def test_pool_matches_sequential():
    stark = fast_test_config()
    tasks = _tasks(3)
    with ProvingPool(max_workers=2) as pool:
        proofs = pool.prove_all("fibonacci", tasks, stark)
    assert len(proofs) == 3

    seq_prover = Prover.setup(ProverConfig(app_name="fibonacci",
                                           stark=stark))
    for task, proof in zip(tasks, proofs):
        seq = seq_prover.gen_proof_stark(task)
        # deterministic prover: identical statements and proof bodies
        assert seq.user_pvs_proof == proof.user_pvs_proof
        assert seq.proof == proof.proof
        assert UniversalVerifier.verify_stark_proof_with_vk(
            seq_prover.get_app_vk(), proof, stark)
