from .testers import (
    BatchTaskGenerator,
    BundleTaskGenerator,
    ChunkTaskGenerator,
    prove_verify,
)

__all__ = [
    "ChunkTaskGenerator",
    "BatchTaskGenerator",
    "BundleTaskGenerator",
    "prove_verify",
]
