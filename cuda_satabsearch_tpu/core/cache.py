"""Persistent XLA compilation cache setup.

The search kernels compile once per (query order, bucket shape) — tens
of seconds on a remote-compile TPU backend (the analog of the
reference's ahead-of-time nvcc build: its kernels are compiled once at
build time, cudaSaTabsearch Makefile:92-116).  Enabling JAX's
persistent compilation cache makes every process after the first reuse
the compiled programs, turning one-shot CLI runs from ~30 s warm-up
into ~1 s.

Called by the CLI, SearchSession, and bench entry points; a no-op if
the cache is already configured or disabled via SATAB_NO_COMPILE_CACHE.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compile_cache() -> None:
    global _DONE
    if _DONE or os.environ.get("SATAB_NO_COMPILE_CACHE"):
        return
    _DONE = True
    import jax

    cache_dir = os.environ.get(
        "SATAB_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "satabsearch_tpu", "xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:  # pragma: no cover - best effort; cache is an
        pass  # optimization, never a correctness requirement
