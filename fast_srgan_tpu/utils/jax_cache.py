"""Persistent XLA compilation cache for the CLIs.

TPU compiles of the full generator take 20-240 s through this environment's
remote-compile path (and ~20-40 s on a normal host). The JAX persistent
compilation cache keys serialized executables by HLO hash, so every CLI
(infer/train/bench) enables it: the second process-level run of the same
shape loads the binary instead of recompiling.
"""

from __future__ import annotations

import os


def enable(directory: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent); returns dir.

    No-op (returns "") on CPU: XLA:CPU AOT cache entries embed the compile
    machine's feature set and reload with SIGILL-risk warnings on a host
    whose features differ (observed in this environment). CPU compiles are
    seconds anyway; the cache only pays for itself on TPU.
    """
    import jax

    from fast_srgan_tpu.utils.platforms import honor_env_platforms

    # The env var must win over sitecustomize's programmatic platform
    # force-set (see utils/platforms.py) — and must be applied before the
    # default_backend() probe below can initialize the wrong backend.
    honor_env_platforms()

    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if platforms:
        if all(p.strip() == "cpu" for p in platforms.split(",") if p.strip()):
            return ""
    elif jax.default_backend() == "cpu":
        # Nothing configured and JAX auto-selected CPU (no accelerator):
        # same SIGILL-risk scenario, same skip. Initializing the backend
        # here is fine — the cache config only needs to precede compiles.
        return ""
    directory = (
        directory
        or os.environ.get("FASTSR_JAX_CACHE")
        or os.path.expanduser("~/.cache/fast_srgan_tpu/xla")
    )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    # Cache everything, however small/fast-compiling.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return directory
