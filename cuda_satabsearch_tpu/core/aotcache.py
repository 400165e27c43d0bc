"""Ahead-of-time executable cache: serialize compiled search programs
to disk so a fresh process LOADS them instead of re-tracing and
re-compiling.

Why the XLA persistent compile cache is not enough: a warm process
still pays Python/JAX tracing (~2.4 s measured for the headline
program family) plus the cache-hit compile round trip (~1.6 s) before
its first search (scripts/aot_experiment.py, 2026-08-21).
jax.experimental.serialize_executable round-trips the COMPILED
executable in ~20 ms on the same hardware (4.4 MB payload), skipping
both.  This is the TPU analog of the reference shipping an
ahead-of-time nvcc-built binary: the expensive build happens once,
every later run just loads it.

Keying: executables are only valid for the exact program + argument
signature + toolchain, so the cache key hashes (a) a caller-provided
program key (kernel config tuple), (b) the shape/dtype signature of
the example args, (c) the jax version and device kind, and (d) the
source text of the kernel modules (a kernel edit invalidates the
cache).  Any load failure falls back to the normal trace+compile path
— the cache is an optimization, never a correctness dependency.

Mesh/SPMD programs are NOT cached (single-device executables only;
under a mesh the shard_map program is device-topology-bound).
"""

from __future__ import annotations

import hashlib
import os
import pickle

_SALT = None


def _cache_dir() -> str:
    d = os.environ.get(
        "SATAB_AOT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "satabsearch_tpu", "aot"))
    os.makedirs(d, exist_ok=True)
    return d


def _source_salt() -> str:
    """Hash of the kernel/dispatch sources + toolchain identity."""
    global _SALT
    if _SALT is None:
        import jax

        h = hashlib.sha256()
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for rel in ("ops/pallas_sa2.py", "ops/pallas_search.py",
                    "ops/common.py", "core/constants.py"):
            try:
                with open(os.path.join(here, rel), "rb") as fh:
                    h.update(fh.read())
            except OSError:
                h.update(rel.encode())
        h.update(jax.__version__.encode())
        try:
            import jaxlib

            h.update(jaxlib.__version__.encode())
        except Exception:
            h.update(b"nojaxlib")
        try:
            dev = jax.devices()[0]
            h.update(dev.device_kind.encode())
            h.update(str(jax.device_count()).encode())
            # platform_version carries the runtime (libtpu) build —
            # the staleness source a pure jax version check misses
            h.update(str(getattr(dev.client, "platform_version",
                                 "")).encode())
        except Exception:
            h.update(b"nodev")
        _SALT = h.hexdigest()[:16]
    return _SALT


def _args_sig(args) -> str:
    import jax

    def leaf(x):
        a = jax.numpy.asarray(x) if not hasattr(x, "shape") else x
        return (tuple(a.shape), str(a.dtype))

    return repr(jax.tree.map(leaf, args))


class AotJit:
    """jit wrapper that loads/stores the compiled executable on disk.

    First call: try to deserialize the executable for (key, args
    signature); on miss (or any load error) lower+compile normally and
    serialize the result.  Subsequent calls reuse the in-memory
    compiled object.  Falls back to the plain jit fn permanently if
    AOT is unusable (old jax, exotic args, SPMD)."""

    def __init__(self, fn, key_parts, enabled: bool = True):
        import jax

        self._jit = jax.jit(fn)
        self._key_parts = key_parts
        self._compiled = None
        self._fallback = not enabled or bool(
            os.environ.get("SATAB_NO_AOT_CACHE"))

    def __call__(self, *args):
        if self._compiled is not None:
            return self._compiled(*args)
        if self._fallback:
            return self._jit(*args)

        path = self._path(args)
        # a cached executable can deserialize fine yet still be stale
        # (device topology change the key missed, toolchain quirk), so
        # the FIRST call from cache is execution-guarded: any failure
        # evicts the file and falls through to a clean rebuild
        compiled = self._try_load(path)
        if compiled is not None:
            try:
                out = compiled(*args)
                # JAX dispatch is async: a stale executable can fail
                # AFTER this call returns, at the caller's drain, where
                # no eviction happens.  Force completion of ONE output
                # element (a single-element D2H) before adopting the
                # cached executable, so staleness surfaces HERE and
                # evicts the file.
                import jax as _jax
                import numpy as _np

                leaf = _jax.tree_util.tree_leaves(out)[0]
                _np.asarray(leaf.ravel()[:1])
                self._compiled = compiled
                return out
            except Exception:
                try:
                    os.unlink(path)
                except OSError:
                    pass
        try:
            self._compiled = self._compile_and_store(path, args)
        except Exception as e:  # pragma: no cover - env-dependent
            import sys

            print(f"# aot-cache disabled for this program "
                  f"({type(e).__name__}: {str(e).splitlines()[0][:120]})",
                  file=sys.stderr)
            self._fallback = True
            return self._jit(*args)
        return self._compiled(*args)

    def lower(self, *args):
        """Pass-through to the wrapped jit's lower() (measurement
        scripts use it to split trace from compile)."""
        return self._jit.lower(*args)

    def _path(self, args) -> str:
        h = hashlib.sha256()
        h.update(repr(self._key_parts).encode())
        h.update(_args_sig(args).encode())
        h.update(_source_salt().encode())
        return os.path.join(_cache_dir(), h.hexdigest()[:32] + ".aot")

    @staticmethod
    def _try_load(path):
        if not os.path.exists(path):
            return None
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load)

            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            return deserialize_and_load(payload, in_tree, out_tree)
        except Exception:
            try:
                os.unlink(path)  # corrupt/stale: rebuild
            except OSError:
                pass
            return None

    def _compile_and_store(self, path, args):
        from jax.experimental.serialize_executable import serialize

        compiled = self._jit.lower(*args).compile()
        try:
            payload, in_tree, out_tree = serialize(compiled)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                pickle.dump((payload, in_tree, out_tree), fh)
            os.replace(tmp, path)  # atomic vs concurrent writers
        except Exception:  # pragma: no cover - serialization is
            pass  # best-effort; the compiled object still works
        return compiled
