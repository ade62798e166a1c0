"""One-time JAX runtime configuration (compilation cache, flags)."""

from __future__ import annotations

import os

_done = False


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache so the large detect-step XLA
    programs compile once per machine, not once per process (first compile of
    the 640px model is minutes through the remote-TPU tunnel)."""
    global _done
    if _done:
        return
    _done = True
    import jax

    path = cache_dir or os.environ.get(
        "RTMODT_JAX_CACHE", os.path.expanduser("~/.cache/rtmodt_jax_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
