"""Persistent XLA compilation cache.

The whole run is a handful of large jitted programs (the fori_loop
trainer, the top-1 scan); first-compile through a remote TPU attachment
costs tens of seconds. Enabling JAX's persistent cache makes every
subsequent process start warm — the analogue of the reference shipping
prebuilt binaries (its `make` step) rather than recompiling per run.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "recsys_tpu_xla")


def enable_persistent_cache(path: str | None = None) -> None:
    """Idempotently turn on the on-disk compilation cache."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or read-only fs: run cold, still correct
