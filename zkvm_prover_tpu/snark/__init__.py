"""BN254 SNARK wrapper layer (ROADMAP Phase 7).

The TPU-native analog of the reference's halo2/snark-verifier outer layer
(crates/prover/src/prover/mod.rs:419-432, crates/verifier/src/evm.rs): a
PLONK proof system over BN254 with KZG commitments, a wrapper circuit
binding the root STARK proof's (vk, public values) into the on-chain
EvmProof instance layout, a generated EVM-bytecode verifier, and a mini
EVM simulator to execute it (the revm-simulation analog).
"""
