"""Knockout profile of the v2 Pallas SA kernel: attribute the
per-iteration cycle budget by replacing one kernel stage at a time with
a cheap stand-in (pallas_sa2 make_pallas2_bucket_search(knock=...)) and
measuring the wall-clock delta on the real chip.

Each config runs the kernel directly (no search-layer orchestration)
with r_seq sequential restarts in ONE pallas_call so the ~25-35 ms
dispatch round trip through the TPU tunnel is amortized away.

Usage: python scripts/profile_iter.py [--rseq 16] [--reps 5]
Writes a table to stdout (knock, ms, delta vs full, share of full).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

KNOCKS = [(), ("rng",), ("thinit",), ("initscore",), ("gather",),
          ("lorder",), ("fetch",), ("tsc",), ("select",), ("update",),
          ("gather", "fetch", "tsc"),
          ("gather", "fetch", "tsc", "select", "update", "lorder")]


def profile_shape(E, n1, d2, *, r_seq, reps, maxiter=None, lorder=True):
    import jax
    import jax.numpy as jnp

    from cuda_satabsearch_tpu.core.cache import enable_compile_cache
    from cuda_satabsearch_tpu.core.constants import SAParams, DEFAULTS

    enable_compile_cache()
    from cuda_satabsearch_tpu.ops.pallas_sa2 import (
        make_pallas2_bucket_search, make_qb2_batched,
        make_qflat_batched)
    from cuda_satabsearch_tpu.ops.common import round8

    params = DEFAULTS if maxiter is None else SAParams(maxiter=maxiter)
    n1r = round8(n1)
    rng = np.random.default_rng(7)

    # query-side inputs
    qtabp = (rng.integers(0, 4, (n1r, n1r)) * 8
             + rng.integers(0, 4, (n1r, n1r))).astype(np.float32)
    qdmat = (rng.random((n1r, n1r)) * 20).astype(np.float32)
    qtypes = rng.integers(0, 4, (1, n1r)).astype(np.int32)

    # db-side inputs
    n2 = np.full((E,), d2, np.int32)
    types2 = rng.integers(0, 4, (E * d2, 1)).astype(np.int32)
    tab2p = (rng.integers(0, 4, (E * d2, d2)) * 8
             + rng.integers(0, 4, (E * d2, d2))).astype(np.float32)
    dmat2 = (rng.random((E * d2, d2)) * 20).astype(np.float32)
    rng_in = np.concatenate([[1234, 0], np.arange(E)]).astype(np.int32)
    tags = np.zeros((1,), np.int32)

    results = {}
    for knock in KNOCKS:
        fn, G = make_pallas2_bucket_search(
            E, n1, d2, 128, r_seq, lorder, params, False, "pltpu",
            lsoln=False, nq=1, batched_api=True,
            knock=frozenset(knock))
        if fn.qrep == "qflat":
            qb2t, qb2d = make_qflat_batched(qtabp[None], qdmat[None])
        else:
            qb2t, qb2d = make_qb2_batched(qtabp[None], qdmat[None], G)
        args = [jnp.asarray(x) for x in
                (n2, qtypes, qb2t, qb2d, types2, tab2p, dmat2,
                 rng_in, tags)]
        # reduce on device so the drain transfer is tiny; drain with a
        # REAL D2H (np.asarray) — on the axon platform
        # block_until_ready() returns before the device work finishes,
        # so transfer-free timing measures only dispatch
        jfn = jax.jit(lambda *a: jnp.sum(fn(*a)[0]))
        np.asarray(jfn(*args))  # compile + run
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jfn(*args))
            best = min(best, time.perf_counter() - t0)
        results[",".join(knock) or "full"] = best
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rseq", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--shapes", default="128:8:8,128:8:16,112:19:24")
    args = ap.parse_args()

    for spec in args.shapes.split(","):
        E, n1, d2 = map(int, spec.split(":"))
        res = profile_shape(E, n1, d2, r_seq=args.rseq, reps=args.reps)
        # fixed-cost estimate: same shape at maxiter=10 extrapolates
        # the per-iteration slope
        res10 = profile_shape(E, n1, d2, r_seq=args.rseq,
                              reps=args.reps, maxiter=10)
        full = res["full"]
        iters = E * 128 * args.rseq * 100
        print(f"\n== E={E} n1={n1} d2={d2} r_seq={args.rseq} "
              f"(full: {full * 1e3:.2f} ms, "
              f"{iters / full / 1e6:.0f} M it/s)")
        per_iter = (full - res10["full"]) / 90  # s per annealing iter
        print(f"   maxiter=10: {res10['full'] * 1e3:.2f} ms -> "
              f"per-iter {per_iter * 1e6:.1f} us, fixed/restart "
              f"{(res10['full'] - 10 * per_iter * args.rseq) * 1e3:.2f}"
              " ms-total")
        for name, t in sorted(res.items(), key=lambda kv: kv[1]):
            if name == "full":
                continue
            d = full - t
            print(f"   {name:24s} {t * 1e3:8.2f} ms   saves "
                  f"{d * 1e3:7.2f} ms  ({d / full * 100:5.1f}%)")


if __name__ == "__main__":
    main()
