"""Shared runtime setup: persistent XLA compilation cache, backend quirks."""

import os


def donation_argnums(argnums=(0,)):
    """Buffer donation is a memory optimization only. The experimental
    'axon' tunnel backend (remote single-chip TPU used in CI) fails with
    an opaque INVALID_ARGUMENT at run time when large multi-output train
    steps donate their state pytree, so donation is disabled there; real
    TPU (and CPU) backends keep it. Override with MEBT_FORCE_DONATE=1 /
    MEBT_NO_DONATE=1.
    """
    if os.environ.get("MEBT_FORCE_DONATE"):
        return argnums
    if os.environ.get("MEBT_NO_DONATE"):
        return ()
    try:
        import jax

        ver = jax.devices()[0].client.platform_version
    except Exception:
        return argnums
    if "axon" in str(ver).lower():
        return ()
    return argnums


def enable_compilation_cache():
    """Cache compiled executables across processes (compiles through the
    remote TPU tunnel are slow); harmless on CPU."""
    import jax

    cache_dir = os.environ.get(
        "MEBT_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
