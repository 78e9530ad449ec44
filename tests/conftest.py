"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is exercised only by bench.py / the driver; tests must be
hermetic and exercise the multi-chip sharding paths on the host platform
(SURVEY.md §4: "multi-chip/multi-host tests (1 chip ↔ 1 host ↔ N hosts
bit-identity)").
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the session env presets 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jaxtyping's pytest plugin imports jax before this conftest runs, so the
# env vars above may be captured too late — set the config directly too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: do NOT enable jax_compilation_cache_dir here — on this image the
# persistent cache makes compiles pathologically slow (measured 137s vs 0.5s
# for the same program).


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running prove/verify tests"
    )
