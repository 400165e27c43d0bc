"""Backend warm-up: absorb the per-process remote-compile session init.

Measured on the axon-tunnel TPU (2026-08-21): the FIRST program a
process executes on the device pays a compile-service session init of
~2-5 minutes REGARDLESS of program content — a one-op Pallas kernel
costs ~120 s, the full 8-kernel search program ~220-320 s — and every
program after the first compiles in ~1-5 s.  The local persistent XLA
cache (core/cache.py) does not help: its hits are sub-second, the cost
sits behind the first remote execution.  (On a local TPU PjRt client
none of this applies and the warm-up kernel costs milliseconds.)

So: run the cheapest possible kernel once, eagerly, at session
construction, and report the cost as what it is — environment session
init — separately from the framework's own compile time.  The
reference's analog is nvcc build time: paid outside the measured run
(its in-run startup is < 1 s, README_example_usage.txt:32).

Disable with SATAB_NO_WARMUP=1 (e.g. when benchmarking the raw cost).
"""

from __future__ import annotations

import os
import sys
import time

_DONE = False


def warm_backend(log: bool = True) -> float:
    """Execute a one-op Pallas kernel to open the backend's compile
    session; returns the wall seconds spent (0.0 when skipped: already
    warmed, disabled, or running on CPU)."""
    global _DONE
    if _DONE or os.environ.get("SATAB_NO_WARMUP"):
        return 0.0
    _DONE = True
    import jax

    if jax.default_backend() == "cpu":
        return 0.0
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    t0 = time.perf_counter()
    try:
        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] + 1.0

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(
                jnp.zeros((8, 128), jnp.float32))
        np.asarray(out)  # drain: block_until_ready lies on axon
    except Exception as e:  # pragma: no cover - warm-up is best effort
        # a genuinely broken backend will resurface at DB upload /
        # search with less context — make the failure point visible
        print(f"# backend warm-up failed ({type(e).__name__}: {e}); "
              f"continuing — expect the first real dispatch to fail "
              f"or pay the compile-service init", file=sys.stderr)
        return 0.0
    dt = time.perf_counter() - t0
    if log and dt > 1.0:
        print(f"# backend warm-up (remote compile-service session "
              f"init, environment cost): {dt:.1f} s", file=sys.stderr)
    return dt
