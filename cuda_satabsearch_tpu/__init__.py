"""TPU-native SA Tableau Search.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
CUDA "SA Tableau Search" protein-substructure search program
(reference: stivalaa/cuda_satabsearch), designed TPU-first:

* the simulated-annealing matching kernel runs as a batched, fully
  vectorized program over (db-entry, chain) SIMD axes with counter-based
  threefry RNG (no per-thread mutable RNG state),
* the database is parsed into padded, size-bucketed dense arrays resident
  in device memory, sharded by entry over a ``jax.sharding.Mesh`` for
  multi-chip / multi-host execution,
* score statistics (norm2 / Gumbel z-score / p-value) and the CLI stdin
  protocol are drop-in compatible with the reference driver.

Package layout:
  core/      constants and code tables (reference: saparams.h, parsetableaux.c)
  io/        ASCII database/query parsing and TPU array packing
  ops/       golden scalar model + vectorized JAX engine + Pallas kernel
  stats/     score normalization and Gumbel statistics (gumbelstats.c)
  parallel/  device-mesh sharding of the search (no reference equivalent:
             the reference is single-GPU)
  cli/       the ``satabsearch`` command-line driver (cudaSaTabsearch.cu)
  eval/      ROC/AUC evaluation harness (scripts/tsevalutils.py etc.)
  utils/     RNG and gather helpers
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: compiles on the TPU tunnel backend can
# take minutes and serialize on a remote compile service, so losing them
# across processes is very costly.  Set before jax initializes its config
# (importing this package before jax is enough; jax also re-reads the env
# var lazily for the cache dir).
_cache_dir = _os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "satabsearch_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The environment's sitecustomize imports jax at interpreter start, so
# jax's config has already read (and missed) the env vars above; set the
# config directly as well.
try:  # pragma: no cover - depends on jax presence
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # jax missing or config renamed: cache is best-effort
    pass
