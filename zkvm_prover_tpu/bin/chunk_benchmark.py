"""chunk-benchmark: execute + prove a chunk task with metric collection.

Parity with the reference's `chunk-benchmark` bin
(/root/reference/crates/integration/src/bin/chunk-benchmark.rs:13-51:
BenchmarkCli + run_with_metric_collection -> metrics.json).

Usage: python -m zkvm_prover_tpu.bin.chunk_benchmark [--metrics PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", default="metrics.json")
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    ap.add_argument("--fast", action="store_true",
                    help="reduced-query test config (NOT secure)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..integration import ChunkTaskGenerator
    from ..stark.config import StarkConfig, fast_test_config
    from ..utils import tracing

    os.environ.setdefault("OUTPUT_DIR", tempfile.mkdtemp())
    gen = ChunkTaskGenerator(
        stark=fast_test_config() if args.fast else StarkConfig()
    )

    with tracing.span("chunk/execute"):
        w = gen.witness(0)
    total_gas = w.total_gas_used
    t0 = time.time()
    with tracing.span("chunk/prove", cycles=total_gas):
        proof = gen.get_or_build_proof(0)
    wall = time.time() - t0

    stats = proof.stat.to_dict()
    stats["wall_clock_s"] = wall
    stats["total_gas"] = total_gas
    # cycles-per-gas budget (reference asserts <= 35,
    # crates/integration/tests/chunk_circuit.rs:44-54); enforced here as
    # an observability gate — a regression in guest efficiency fails the
    # benchmark run loudly rather than silently bloating proofs.
    if total_gas:
        cpg = proof.stat.total_cycles / total_gas
        stats["cycles_per_gas"] = round(cpg, 4)
        assert cpg <= 35, (
            f"cycles/gas budget exceeded: {cpg:.2f} > 35"
        )
    tracing.dump_metrics(args.metrics)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
