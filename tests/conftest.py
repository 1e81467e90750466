"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding/parallelism tests need multiple devices; the CI/test environment has
at most one TPU chip, so tests force the CPU backend with 8 virtual devices
(the driver validates the multi-chip path the same way via dryrun_multichip).
"""

import os

# The session environment registers an 'axon' TPU backend from sitecustomize
# and forces jax_platforms via jax.config — env vars alone cannot override it.
# Set the XLA flag first (read lazily at CPU-backend creation), then override
# the platform through jax.config after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA:CPU compile
# time (every worker re-compiles the same tiny-model programs). The cache
# makes warm reruns minutes faster; it is shared with bench.py's TPU cache
# dir but entries are keyed by platform so they never collide.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "MMEE_TEST_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# JAX's CPU backend lowers matmuls to bf16-ish precision by default (oneDNN);
# parity tests need true float32 accumulation. The env var is not wired in this
# jax version, so set the config directly.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 42
