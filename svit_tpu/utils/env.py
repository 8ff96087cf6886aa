"""Runtime environment helpers."""

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def enable_compilation_cache(cache_dir: str = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    Standard practice for TPU deployments: large train-step compiles are
    AOT-cached on disk, so process restarts (preemption resume, the driver's
    multichip dryrun, repeated CLI invocations) skip the multi-minute XLA
    compile.  The repo ships a warmed cache for the dryrun path.
    Safe to call after jax import; a corrupt/foreign cache only causes
    misses, never failures.
    """
    import jax

    cache_dir = cache_dir or os.environ.get("SVIT_JAX_CACHE_DIR", DEFAULT_CACHE_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jaxlib without the persistent cache: no-op


def apply_jax_platform_env() -> None:
    """Honor ``JAX_PLATFORMS`` even on jaxlibs that pin a platform.

    The deployment jaxlib initializes its tunneled TPU platform regardless of
    the env var; ``jax.config`` still wins, so mirror the env var into it.
    Must be called before any jax backend is initialized.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
