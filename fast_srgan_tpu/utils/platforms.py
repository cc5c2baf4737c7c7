"""Make the JAX_PLATFORMS environment variable authoritative.

This environment's interpreter boot (a sitecustomize on PYTHONPATH)
registers the axon TPU plugin and programmatically force-sets
``jax.config.jax_platforms`` (observed: ``'axon,cpu'``). A config value
set by ``jax.config.update`` outranks the JAX_PLATFORMS env var, so a
user running ``JAX_PLATFORMS=cpu python train.py ...`` — the documented
CPU-mesh recipe (Makefile smoke target, soak drill, multihost smoke) —
silently still dials the TPU tunnel first, and during a tunnel outage
``jax.devices()`` hangs indefinitely instead of using the requested CPU
backend.

``honor_env_platforms()`` restores the env contract: if JAX_PLATFORMS is
set and disagrees with the live config, the env wins. Entry points call
it immediately after importing jax, BEFORE any device access (platform
selection is frozen at backend initialization). It is a no-op when the
env var is unset — sitecustomize's choice then stands, which is what a
plain ``python train.py`` on the TPU host wants.
"""

from __future__ import annotations

import os


def honor_env_platforms() -> str | None:
    """Apply JAX_PLATFORMS from the environment to the live jax config.

    Returns the platform string applied, or None if the env var is unset
    (or already in effect). Must run before the first device access.
    """
    want = os.environ.get("JAX_PLATFORMS", "").strip()
    if not want:
        return None
    import jax

    if jax.config.jax_platforms == want:
        return None
    try:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            # Platform selection is frozen once a backend exists;
            # switching now could not take effect (and a library import
            # mid-process must never yank an app off its live backend).
            # Warn: a silently-ignored JAX_PLATFORMS is the exact failure
            # mode this module exists to kill — the caller touched
            # devices before honoring the env.
            import warnings

            warnings.warn(
                f"JAX_PLATFORMS={want!r} cannot take effect: the JAX "
                f"backend is already initialized on "
                f"{jax.config.jax_platforms!r}. Call honor_env_platforms()"
                " before any device access.",
                RuntimeWarning,
                stacklevel=2,
            )
            return None
    except (ImportError, AttributeError):  # private API moved: fail open
        pass
    jax.config.update("jax_platforms", want)
    return want
