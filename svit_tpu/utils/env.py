"""Runtime environment helpers."""

import os


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
