"""Interleaved same-process A/B of two kernel configurations.

Across-process rates on this chip drift +-8% over hours, so effects
below ~10% are ONLY resolvable by compiling both variants in one
process and alternating timed reps (see PERF.md measurement note).

Usage:
  python scripts/ab_kernel.py --d2 8 --a unroll=1 --b unroll=2
  python scripts/ab_kernel.py --d2 16 --a fetch=dgp --b fetch=dg
Config overrides: fetch=..., group=N, cum=..., unroll=N.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_cfg(spec):
    cfg = {}
    for kv in filter(None, spec.split(",")):
        k, v = kv.split("=")
        cfg[k] = int(v) if v.isdigit() else v
    return cfg


def build(d2, K, r_seq, E, n1, cfg):
    import jax
    import jax.numpy as jnp

    from cuda_satabsearch_tpu.ops.common import round8
    from cuda_satabsearch_tpu.ops.pallas_sa2 import (
        make_pallas2_bucket_search, make_qb2_batched, make_qflat_batched)

    n1r = round8(n1)
    rng = np.random.default_rng(7)
    qtabp = (rng.integers(0, 4, (K, n1r, n1r)) * 8
             + rng.integers(0, 4, (K, n1r, n1r))).astype(np.float32)
    qdmat = (rng.random((K, n1r, n1r)) * 20).astype(np.float32)
    qtypes = rng.integers(0, 4, (K, n1r)).astype(np.int32)
    n2 = np.full((E,), d2, np.int32)
    types2 = rng.integers(0, 4, (E * d2, 1)).astype(np.int32)
    tab2p = (rng.integers(0, 4, (E * d2, d2)) * 8
             + rng.integers(0, 4, (E * d2, d2))).astype(np.float32)
    dmat2 = (rng.random((E * d2, d2)) * 20).astype(np.float32)
    rng_in = np.concatenate([[1234, 0], np.arange(E)]).astype(np.int32)
    tags = np.arange(K, dtype=np.int32)

    fn, G = make_pallas2_bucket_search(
        E, n1, d2, 128, r_seq, True, interpret=False, rng_mode="pltpu",
        lsoln=False, nq=K, batched_api=True, **cfg)
    if fn.qrep == "qflat":
        qa, qb = make_qflat_batched(qtabp, qdmat)
    else:
        qa, qb = make_qb2_batched(qtabp, qdmat, G)
    args = [jnp.asarray(x) for x in
            (n2, qtypes, qa, qb, types2, tab2p, dmat2, rng_in,
             tags)]
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a)[0]))
    np.asarray(jfn(*args))
    return jfn, args, G


def main():
    from cuda_satabsearch_tpu.core.cache import enable_compile_cache
    from cuda_satabsearch_tpu.core.warmup import warm_backend

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--d2", type=int, default=8)
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--K", type=int, default=64)
    ap.add_argument("--rseq", type=int, default=2)
    ap.add_argument("--E", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--a", default="", help="variant A overrides")
    ap.add_argument("--b", required=True, help="variant B overrides")
    args = ap.parse_args()
    warm_backend()

    va = build(args.d2, args.K, args.rseq, args.E, args.n1,
               parse_cfg(args.a))
    vb = build(args.d2, args.K, args.rseq, args.E, args.n1,
               parse_cfg(args.b))
    best = {"A": float("inf"), "B": float("inf")}
    for _ in range(args.rounds):
        for name, (fn, fa, _g) in (("A", va), ("B", vb)):
            t0 = time.perf_counter()
            np.asarray(fn(*fa))
            best[name] = min(best[name], time.perf_counter() - t0)
    iters = args.E * 128 * args.rseq * 100 * args.K
    for name, spec in (("A", args.a or "(default)"), ("B", args.b)):
        t = best[name]
        print(f"d2={args.d2} {name} [{spec}]: {t * 1e3:8.2f} ms = "
              f"{iters / t / 1e6:7.1f} M it/s")
    print(f"B/A speed ratio: {best['A'] / best['B']:.3f}x")


if __name__ == "__main__":
    main()
