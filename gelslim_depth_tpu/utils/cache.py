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


def pin_platform(device: str | None = None) -> None:
    """Honor an explicit platform request BEFORE jax's backend init.

    Two quirks make this necessary:
    - The reference CLI takes a positional device string (ref
      train_unet.py:58,194 reads sys.argv[2] as a CUDA ordinal); 'cpu'
      there must actually keep the run off the accelerator.
    - When a TPU platform plugin (axon) is installed, the JAX_PLATFORMS
      env var alone is NOT honored — the plugin still initializes (and a
      broken tunnel then hangs every CLI command, even ones the user
      explicitly asked to run on cpu). Pinning through jax.config works.

    Only 'cpu' and 'tpu' are pinned; a JAX-style comma priority list
    ('cpu,tpu') pins its HEAD — jax_platforms treats every listed platform
    as required-to-initialize, so forwarding the full list would make a
    broken tunnel fail even the cpu half, the exact hang/failure this
    function exists to prevent. Any other value (CUDA ordinals etc.) is
    the reference's GPU selection, which has no meaning here and keeps
    the documented ignored-positional behavior."""
    want = (device or os.environ.get("JAX_PLATFORMS") or "").strip().lower()
    head = want.split(",")[0].strip()
    if head in ("cpu", "tpu"):
        import jax

        jax.config.update("jax_platforms", head)
