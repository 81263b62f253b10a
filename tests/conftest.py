"""Test environment: CPU backend with 8 virtual devices, x64 enabled.

Multi-chip sharding semantics are exercised on a simulated device mesh
(SURVEY.md §4(f)): XLA's host platform is forced to expose 8 devices, which
lets `shard_map`/`pjit` tests run anywhere.  x64 is enabled so the engine can
be run in f64 for near-bitwise comparison against the numpy oracle (the TPU
production path remains f32).

NOTE: the installed `jaxtyping` pytest plugin imports jax before this
conftest executes, so plain env-var settings for JAX_PLATFORMS/JAX_ENABLE_X64
would be read too late.  `jax.config.update` works after import (backends are
only initialized on first use), and XLA_FLAGS is read at backend init, so
setting it here is still early enough.
"""

import os

if os.environ.get("RTOW_TESTS_TPU"):
    # On-hardware test mode: keep the real backend (and f32 — x64 is a
    # CPU-oracle affordance) so @skipif(backend != "tpu") tests run.
    # Usage: RTOW_TESTS_TPU=1 pytest tests/test_parallel.py -k marble_tpu
    import jax  # noqa: F401
else:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
