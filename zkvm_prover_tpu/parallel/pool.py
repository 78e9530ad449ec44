"""Task-level proving parallelism — the reference's parallel chunk
proving / proof-tree sibling parallelism (SURVEY §2.3 axis: the
integration harness proves independent chunks concurrently, and an
aggregation node's children are independent proofs).

Design: OS processes, not threads — each worker owns a full prover stack
(XLA client, caches) so independent proofs never serialize on the GIL or
on one device queue. Workers are assigned a device by rank through
`ZKVM_TPU_POOL_DEVICE`: on a multi-chip host, worker k pins chip
k % n_chips (JAX visible-device selection); on CPU hosts every worker
forces the cpu platform. Tasks and proofs cross the process boundary as
the host API's JSON envelopes — the same wire format the disk cache and
release assets use.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
from concurrent.futures import ProcessPoolExecutor
from dataclasses import dataclass
from typing import List, Optional, Sequence

from ..host.proof_types import StarkProof
from ..host.task import ProvingTask


def _worker_init(device_assignment: Optional[str]) -> None:
    """Runs once per worker process, BEFORE jax initialises."""
    rank = int(mp.current_process().name.rsplit("-", 1)[-1]) \
        if "-" in mp.current_process().name else 0
    if device_assignment == "cpu" or device_assignment is None:
        os.environ["JAX_PLATFORMS"] = "cpu"
        # the axon plugin ignores JAX_PLATFORMS; the config update in
        # _prove_one covers it
        os.environ["ZKVM_TPU_POOL_RANK"] = str(rank)
    elif device_assignment == "tpu":
        # one chip per worker: restrict the visible device by rank
        os.environ["ZKVM_TPU_POOL_RANK"] = str(rank)


def _prove_one(args) -> dict:
    """Worker entry: (app_name, task_json, config_json) -> proof dict."""
    app_name, task_json, cfg = args
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    from ..host.prover import Prover, ProverConfig
    from ..stark.config import StarkConfig
    from ..stark.fri import FriConfig

    fri = FriConfig(**cfg["fri"])
    stark = StarkConfig(fri=fri)
    prover = Prover.setup(ProverConfig(
        app_name=app_name, stark=stark,
        child_verification=cfg.get("child_verification", "in-circuit"),
    ))
    task = ProvingTask.from_dict(json.loads(task_json))
    proof = prover.gen_proof_stark(task)
    return proof.to_dict()


def _cfg_dict(stark, child_verification: str = "in-circuit") -> dict:
    return {
        "fri": {
            "log_blowup": stark.fri.log_blowup,
            "num_queries": stark.fri.num_queries,
            "proof_of_work_bits": stark.fri.proof_of_work_bits,
        },
        "child_verification": child_verification,
    }


@dataclass
class ProvingPool:
    """Parallel prover over independent tasks (chunk-level parallelism).

    with ProvingPool(max_workers=4) as pool:
        proofs = pool.prove_all("chunk", tasks, stark_config)
    """

    max_workers: int = 2
    device: str = "cpu"   # "cpu" | "tpu"

    def __enter__(self) -> "ProvingPool":
        ctx = mp.get_context("spawn")  # never fork a jax-initialised host
        self._exec = ProcessPoolExecutor(
            max_workers=self.max_workers,
            mp_context=ctx,
            initializer=_worker_init,
            initargs=(self.device,),
        )
        return self

    def __exit__(self, *exc) -> None:
        self._exec.shutdown(wait=True)

    def prove_all(self, app_name: str, tasks: Sequence[ProvingTask],
                  stark, child_verification: str = "in-circuit",
                  ) -> List[StarkProof]:
        cfg = _cfg_dict(stark, child_verification)
        payloads = [
            (app_name, json.dumps(t.to_dict()), cfg) for t in tasks
        ]
        results = list(self._exec.map(_prove_one, payloads))
        return [StarkProof.from_dict(d) for d in results]
