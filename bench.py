"""Benchmark driver — prints ONE JSON line on the last stdout line.

Budgeted: every stage runs under a deadline derived from BENCH_BUDGET_S
(default 480 s) so the driver ALWAYS receives the headline metric — the
round-3 lesson, where an unbounded machine-proof stage ate the whole
driver timeout and no metric landed.

Metrics (BASELINE.json north stars):
  1. BabyBear NTT butterflies/s/chip (headline), measured on the forward
     batched NTT used by the LDE hot path. vs_baseline is against a
     documented estimate of the reference stack's CPU NTT throughput
     (~2.0e9 bf/s, see BASELINE.md "North-star targets").
  2. Full rv32 machine proof at the PRODUCTION security config (FRI 100
     queries, 16 PoW bits — openvm.toml parity) on a guest exercising
     every chip family incl. keccak syscalls; reports wall-clock +
     proving kHz (the reference's proving-speed log,
     crates/prover/src/prover/mod.rs:358-366). Runs on the HOST numpy
     backend: on this tunneled single-chip setup, device readback during
     query openings (~180 KB/s) dominates any on-chip win, so
     ZKVM_TPU_DEVICE_MIN_ELEMS pins the machine-proof path host-side
     while the NTT headline still measures the chip.
  3. BN254 Pippenger MSM pts/s (SNARK-wrapper foundation).
"""

import json
import os
import signal
import time

# Machine proofs: stay on the host numpy backend (see module docstring).
# Must be set before any zkvm_prover_tpu.stark import.
os.environ.setdefault("ZKVM_TPU_DEVICE_MIN_ELEMS", str(1 << 62))

import numpy as np  # noqa: E402

REFERENCE_BUTTERFLIES_PER_SEC = 2.0e9  # documented estimate, see BASELINE.md
BUDGET_S = int(os.environ.get("BENCH_BUDGET_S", "420"))
_T_END = time.time() + BUDGET_S


def _remaining() -> float:
    return _T_END - time.time()


def _with_deadline(fn, seconds):
    """Run fn() under a SIGALRM deadline; raises TimeoutError on expiry."""
    seconds = max(1, int(seconds))

    def _raise(signum, frame):
        raise TimeoutError(f"stage exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def bench_ntt(log_n=20, width=8, reps=2):
    import jax
    import jax.numpy as jnp

    from zkvm_prover_tpu.fields import babybear as bb
    from zkvm_prover_tpu.ops import ntt

    n = 1 << log_n
    rng = np.random.default_rng(0)
    x = bb.to_monty(
        jnp.asarray(
            rng.integers(0, bb.P, size=(n, width), dtype=np.uint64).astype(
                np.uint32
            )
        )
    )

    # NOTE: on the axon platform block_until_ready does not reliably block
    # and host readback is tunnel-slow, so timing always forces a scalar
    # reduction readback and uses a chained-vs-single difference to cancel
    # dispatch overhead.
    K = 8

    @jax.jit
    def chain(v):
        for _ in range(K):
            v = ntt.ntt_natural_to_rev(v)
        return jnp.sum(v[:, 0] & jnp.uint32(1))

    @jax.jit
    def single(v):
        return jnp.sum(ntt.ntt_natural_to_rev(v)[:, 0] & jnp.uint32(1))

    int(chain(x))  # compile+run
    int(single(x))
    t0 = time.time()
    for _ in range(reps):
        int(chain(x))
    dt_chain = (time.time() - t0) / reps
    t0 = time.time()
    for _ in range(reps):
        int(single(x))
    dt_single = (time.time() - t0) / reps
    dt = (dt_chain - dt_single) / (K - 1)

    butterflies = (n // 2) * log_n * width
    return butterflies / dt


def bench_guest_program(n_outer=64, n_inner=128):
    """Guest touching every chip family, one keccak syscall per outer
    iteration (interleaving keeps every register/RAM region within the
    16-bit timestamp-diff window of the offline memory argument)."""
    from zkvm_prover_tpu.vm import asm

    msg_base, out_base = 0x3000, 0x3200
    body = [
        *asm.li("s4", 0),                 # outer counter
        *asm.li("s5", n_outer),
        *asm.li("s1", n_inner),
        *asm.li("s2", 0x9E3779B9),        # accumulator
        *asm.li("s3", msg_base),
        ("label", "outer"),
        *asm.li("s0", 0),                 # inner counter
        ("label", "loop"),
        asm.mul("t0", "s2", "s2"),
        asm.addi("t0", "t0", 0x2D),
        asm.xor("s2", "s2", "t0"),
        asm.srli("t1", "s2", 3),
        asm.add("s2", "s2", "t1"),
        asm.andi("t2", "s0", 0x3C),       # rotating 16-word window
        asm.add("t2", "t2", "s3"),
        asm.sw("s2", "t2", 0),
        asm.lw("t3", "t2", 0),
        asm.divu("t4", "s2", "s1"),
        asm.addi("s0", "s0", 1),
        ("branch", asm.bne, "s0", "s1", "loop"),
        # keccak over the window -> out (touches both RAM regions + a0-a7)
        *asm.li("a0", msg_base), *asm.li("a1", 64),
        *asm.li("a2", out_base), *asm.li("a7", 3), asm.ecall(),
        asm.lw("t5", "a2", 0),            # feed the digest back in
        asm.sw("t5", "s3", 0),
        asm.addi("s4", "s4", 1),
        ("branch", asm.bne, "s4", "s5", "outer"),
    ]
    for i in range(8):
        body += [
            *asm.li("t1", out_base + 4 * i),
            asm.lw("t0", "t1", 0),
            *asm.reveal("t0", i),
        ]
    body.append(asm.halt(0))
    return asm.assemble(body)


def bench_machine_proof(n_outer=8, n_inner=256):
    from zkvm_prover_tpu.models import rv32_v2
    from zkvm_prover_tpu.stark import machine
    from zkvm_prover_tpu.stark.config import default_config
    from zkvm_prover_tpu.vm.executor import HALTED, Rv32Executor

    prog = bench_guest_program(n_outer=n_outer, n_inner=n_inner)
    ex = Rv32Executor()
    ex.load_program(prog)
    t0 = time.time()
    state = ex.run(1 << 18)
    exec_s = time.time() - t0
    assert state == HALTED, state
    cycles = int(ex.cycles)
    t0 = time.time()
    air_traces = rv32_v2.generate_traces(prog, ex.records(),
                                         data_base=0x3000)
    tracegen_s = time.time() - t0
    instances = [machine.AirInstance(a, t, p) for a, t, p in air_traces]
    cfg = default_config()

    t0 = time.time()
    proof = machine.prove_machine(instances, cfg)
    prove_s = time.time() - t0
    t0 = time.time()
    ok = machine.verify_machine([a for a, _, _ in air_traces], proof, cfg)
    verify_s = time.time() - t0
    assert ok, "bench proof failed verification"
    return {
        "guest_cycles": cycles,
        "execution_mhz": round(cycles / 1e6 / max(exec_s, 1e-9), 2),
        "tracegen_s": round(tracegen_s, 3),
        "proof_wall_s": round(prove_s, 3),
        "verify_wall_s": round(verify_s, 3),
        "proving_khz": round(cycles / 1e3 / prove_s, 2),
        "fri_queries": cfg.fri.num_queries,
        "pow_bits": cfg.fri.proof_of_work_bits,
        "backend": "host numpy + native C++ poseidon2/ntt/field kernels "
                   "(see module docstring)",
    }


def bench_msm(n=8192):
    """BN254 MSM pts/s (BASELINE.json metric) — full-width Fr scalars
    through msm_jac's dispatch (native C++ Pippenger when available)."""
    from zkvm_prover_tpu.fields import bn254 as bn

    try:
        from zkvm_prover_tpu.fields import bn254_native

        native = bn254_native.available()
    except Exception:  # pragma: no cover
        native = False
    rng = np.random.default_rng(1)
    base = [bn.g1_mul_jac(bn.G1_GEN, k + 1) for k in range(64)]
    pts = [base[int(i) % 64] for i in rng.integers(0, 64, size=n)]
    scalars = [int.from_bytes(rng.bytes(32), "little") % bn.R
               for _ in range(n)]
    t0 = time.time()
    got = bn.msm_jac(pts, scalars, window=12)
    dt = time.time() - t0
    assert got is not None
    return {
        "n_points": n,
        "msm_wall_s": round(dt, 3),
        "msm_pts_per_s": round(n / dt, 1),
        "scalar_bits": 254,
        "backend": ("native C++ jacobian pippenger" if native
                    else "host-python jacobian pippenger"),
    }


def bench_ntt_2e22(log_n=22, width=2, reps=1):
    """Pod-scale single-chip datapoint (VERDICT r2 #7): one >=2^22 NTT.

    Uses the four-step form: the monolithic 22-stage radix-2 kernel takes
    ~6.5 min of XLA compile through the axon tunnel (measured round 5);
    four-step compiles in seconds and is bit-identical."""
    import jax
    import jax.numpy as jnp

    from zkvm_prover_tpu.fields import babybear as bb
    from zkvm_prover_tpu.parallel.ntt_sharded import (
        ntt_natural_to_rev_four_step_local,
    )

    n = 1 << log_n
    rng = np.random.default_rng(0)
    x = bb.to_monty(
        jnp.asarray(
            rng.integers(0, bb.P, size=(n, width), dtype=np.uint64).astype(
                np.uint32
            )
        )
    )
    K = 3

    @jax.jit
    def chain(v):
        for _ in range(K):
            v = ntt_natural_to_rev_four_step_local(v)
        return jnp.sum(v[:, 0] & jnp.uint32(1))

    @jax.jit
    def single(v):
        return jnp.sum(
            ntt_natural_to_rev_four_step_local(v)[:, 0] & jnp.uint32(1))

    int(chain(x))
    int(single(x))
    t0 = time.time()
    for _ in range(reps):
        int(chain(x))
    dt_chain = (time.time() - t0) / reps
    t0 = time.time()
    for _ in range(reps):
        int(single(x))
    dt_single = (time.time() - t0) / reps
    dt = (dt_chain - dt_single) / (K - 1)
    butterflies = (n // 2) * log_n * width
    return {"log_n": log_n, "width": width, "form": "four-step",
            "butterflies_per_sec": round(butterflies / dt, 1)}


def _run_stage(code: str, timeout_s: float):
    """Run a stage in a subprocess with a HARD kill.

    SIGALRM deadlines cannot interrupt a blocked device RPC (the axon
    tunnel occasionally degrades to minutes-long compiles, which is how
    two in-process-guarded runs still overran their budget); a killed
    child always returns control to the orchestrator."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True,
            timeout=max(10, timeout_s),
        )
        if r.returncode != 0:
            return None, f"rc={r.returncode}: {r.stderr[-200:]}"
        return json.loads(r.stdout.strip().splitlines()[-1]), None
    except subprocess.TimeoutExpired:
        return None, f"killed after {int(timeout_s)}s"
    except Exception as e:  # pragma: no cover
        return None, f"{type(e).__name__}: {e}"[:200]


_CPU_PREFIX = "import jax; jax.config.update('jax_platforms','cpu'); "


def main():
    extra = {}
    # headline first -- it must ALWAYS land. The NTT stages need the real
    # chip; everything else runs on the forced-cpu platform (immune to
    # tunnel weather). Every stage is a kill-able subprocess.
    rate = 0.0
    res, err = _run_stage(
        "import bench, json; print(json.dumps({'r': bench.bench_ntt()}))",
        min(280, _remaining() - 80),
    )
    if res is not None:
        rate = float(res["r"])
    else:
        extra["ntt_full_error"] = err
        res, err = _run_stage(
            "import bench, json; "
            "print(json.dumps({'r': bench.bench_ntt(18, 8, 1)}))",
            min(120, _remaining() - 40),
        )
        if res is not None:
            rate = float(res["r"])
            extra["ntt_fallback_shape"] = "2^18 x 8"
        else:
            extra["ntt_fallback_error"] = err

    stages = [
        ("bn254_msm",
         _CPU_PREFIX + "import bench, json; "
         "print(json.dumps(bench.bench_msm()))", 90),
        ("machine_proof",
         _CPU_PREFIX + "import bench, json; "
         "print(json.dumps(bench.bench_machine_proof()))", 180),
        ("ntt_2e22",
         "import bench, json; "
         "print(json.dumps(bench.bench_ntt_2e22()))", 260),
    ]
    for name, code, cap in stages:
        budget = min(cap, _remaining() - 15)
        if budget < 30:
            extra[f"{name}_skipped"] = "budget exhausted"
            continue
        res, err = _run_stage(code, budget)
        if res is not None:
            extra[name] = res
        else:
            extra[f"{name}_error"] = err

    print(
        json.dumps(
            {
                "metric": "babybear_ntt_butterflies_per_sec_per_chip",
                "value": rate,
                "unit": "butterflies/s",
                "vs_baseline": rate / REFERENCE_BUTTERFLIES_PER_SEC,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
