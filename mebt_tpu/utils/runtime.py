"""Shared runtime setup: persistent XLA compilation cache."""

import os


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
