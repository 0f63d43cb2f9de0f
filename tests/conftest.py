"""Test env: force CPU backend with 8 virtual devices so sharding tests
run without TPU hardware (must be set before jax is imported).

Set MEBT_TEST_TPU=1 to keep the real backend instead — this unlocks the
TPU-gated tests (in-kernel PRNG distribution checks, which are zeros-stub
dead on CPU interpret). Multi-device tests skip on one chip.
"""

import os

if os.environ.get("MEBT_TEST_TPU"):
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # Numerical parity tests need exact fp32 matmuls (the default matmul
    # precision mirrors TPU bf16 passes even on CPU).
    import jax  # noqa: E402

    jax.config.update("jax_default_matmul_precision", "highest")

    # The environment's PJRT plugin may force-register its own platform
    # and override JAX_PLATFORMS; pin the CPU backend explicitly.
    jax.config.update("jax_platforms", "cpu")
