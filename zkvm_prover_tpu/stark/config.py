"""STARK configuration, mirroring the reference's security profile.

Reference values: FRI log_blowup=1, 100 queries, 16 PoW bits,
log_final_poly_len=0 (~100-bit security) — /root/reference/crates/circuits/
chunk-circuit/openvm.toml:1-6, SURVEY.md §6.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .fri import FriConfig
from ..fields import babybear as bb


@dataclass(frozen=True)
class StarkConfig:
    fri: FriConfig = field(default_factory=FriConfig)
    # LDE/commitment coset shift (p3 uses the field generator)
    coset_shift: int = bb.GENERATOR

    @property
    def log_blowup(self) -> int:
        return self.fri.log_blowup

    @property
    def blowup(self) -> int:
        return 1 << self.fri.log_blowup


def default_config() -> StarkConfig:
    return StarkConfig()


def fast_test_config() -> StarkConfig:
    """Reduced-query config for unit tests (NOT secure)."""
    return StarkConfig(
        fri=FriConfig(log_blowup=1, num_queries=8, proof_of_work_bits=4)
    )
