"""Benchmark driver — prints ONE JSON line on the last stdout line.

Headline metric (BASELINE.json): BabyBear NTT butterflies/s/chip, measured on
the forward batched NTT used by the LDE hot path. The reference publishes no
benchmark tables (BASELINE.md), so vs_baseline is reported against a
documented estimate of the reference stack's CPU NTT throughput on the
96-core host target (Plonky3 p3-dft, parallel feature): ~2.0e9
butterflies/s. See BASELINE.md "North-star targets".
"""

import json
import time

import numpy as np

REFERENCE_BUTTERFLIES_PER_SEC = 2.0e9  # documented estimate, see docstring


def main():
    import jax
    import jax.numpy as jnp

    from zkvm_prover_tpu.fields import babybear as bb
    from zkvm_prover_tpu.ops import ntt

    log_n = 20
    width = 8
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
    reps = 3
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
    rate = butterflies / dt
    print(
        json.dumps(
            {
                "metric": "babybear_ntt_butterflies_per_sec_per_chip",
                "value": rate,
                "unit": "butterflies/s",
                "vs_baseline": rate / REFERENCE_BUTTERFLIES_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
