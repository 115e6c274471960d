"""Persistent XLA compilation cache enablement.

Under the tunneled TPU runtime a fresh process pays ~60-200 s per compiled
program shape; pointing every entry point at one on-disk cache makes
repeat invocations (CLI runs, bench, tests on TPU) near-instant."""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gelslim_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
