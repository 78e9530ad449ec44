"""zkvm_prover_tpu — a TPU-native zkVM proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
scroll-tech/zkvm-prover (reference mounted read-only at /root/reference):
chunk -> batch -> bundle recursive STARK proving over BabyBear with a final
BN254 KZG SNARK wrapper — built TPU-first (SPMD meshes, functional
transforms, Pallas kernels for the hot field ops) rather than as a port of
the reference's Rust/CUDA stack.

Layout (mirrors SURVEY.md §7's dependency spine):
  fields/    BabyBear + quartic extension + big-field limb arithmetic
  ops/       Pallas/XLA kernels: mulmod, NTT/LDE, Poseidon2, keccak
  stark/     config, commitment (Merkle/MMCS), challenger, FRI, prover, verifier
  models/    circuit programs (AIRs; chunk/batch/bundle guests in later rounds)
  parallel/  device-mesh sharding of NTT / Merkle / MSM
  vm/        RISC-V trace-generating executor (host-side, later rounds)
  utils/     serialization, tracing/metrics, proof cache
"""

__version__ = "0.1.0"
