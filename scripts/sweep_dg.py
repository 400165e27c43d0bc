"""HW sweep: "dg" dynamic-gather fetch vs the tuned MXU one-hot fetch,
per bucket width, for lane-fusable queries (n1r == 8).

Direct kernel calls (no search-layer orchestration), pltpu RNG,
drain-based timing (np.asarray — block_until_ready lies on axon).

Usage: python scripts/sweep_dg.py [--rseq 8] [--reps 4]
                                  [--widths 8,16,...,112]
Prints per-width M it/s for the current auto config and each dg
(group, cum) candidate; the winners go into pallas_sa2.TUNED_DG.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTHS = (8, 16, 24, 32, 40, 48, 56, 64, 72, 80, 88, 96, 104, 112)


def bench_config(E, n1, d2, *, fetch, group, cum, r_seq, reps, cumb=None):
    import jax
    import jax.numpy as jnp

    from cuda_satabsearch_tpu.ops.common import round8
    from cuda_satabsearch_tpu.ops.pallas_sa2 import (
        make_pallas2_bucket_search, make_qb2, make_qflat)

    n1r = round8(n1)
    rng = np.random.default_rng(7)
    qtabp = (rng.integers(0, 4, (n1r, n1r)) * 8
             + rng.integers(0, 4, (n1r, n1r))).astype(np.float32)
    qdmat = (rng.random((n1r, n1r)) * 20).astype(np.float32)
    qtypes = rng.integers(0, 4, (n1r,)).astype(np.int32)
    n2 = np.full((E,), d2, np.int32)
    types2 = rng.integers(0, 4, (E * d2, 1)).astype(np.int32)
    tab2p = (rng.integers(0, 4, (E * d2, d2)) * 8
             + rng.integers(0, 4, (E * d2, d2))).astype(np.float32)
    dmat2 = (rng.random((E * d2, d2)) * 20).astype(np.float32)
    rng_in = np.concatenate([[1234, 0], np.arange(E)]).astype(np.int32)

    fn, G = make_pallas2_bucket_search(
        E, n1, d2, 128, r_seq, True, interpret=False, rng_mode="pltpu",
        lsoln=False, fetch=fetch, group=group, cum=cum, cumb=cumb)
    if fn.qrep == "qflat":
        qa, qb = make_qflat(qtabp, qdmat)
    else:
        qa, qb = make_qb2(qtabp, qdmat, G)
    args = [jnp.asarray(x) for x in
            (n2, qtypes, qa, qb, types2, tab2p, dmat2, rng_in)]
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a)[0]))
    np.asarray(jfn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return E * 128 * r_seq * 100 / best / 1e6, G


def main():
    from cuda_satabsearch_tpu.core.cache import enable_compile_cache
    from cuda_satabsearch_tpu.core.warmup import warm_backend

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--rseq", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--widths",
                    default=",".join(str(w) for w in WIDTHS))
    ap.add_argument("--groups", default="2,4,8,16")
    args = ap.parse_args()
    warm_backend()

    groups = [int(g) for g in args.groups.split(",")]
    best_dg = {}
    for d2 in (int(w) for w in args.widths.split(",")):
        E = 128 if d2 <= 32 else 64
        # r_seq sized so device time dwarfs the ~25 ms dispatch+drain
        # fixed cost (otherwise ratios compress toward 1)
        rseq = max(args.rseq, min(192, -(-120_000_000
                                         // (E * 128 * 100))))
        base, gb = bench_config(E, args.n1, d2, fetch="auto", group=None,
                                cum="auto", r_seq=rseq,
                                reps=args.reps)
        print(f"d2={d2:3d} E={E:3d} rseq={rseq} auto(G={gb:2d}): "
              f"{base:7.1f} M it/s", flush=True)
        for g in groups:
            if g > E:
                continue
            for cum in ("roll", "mxu"):
                try:
                    v, _ = bench_config(E, args.n1, d2, fetch="dg",
                                        group=g, cum=cum,
                                        r_seq=rseq, reps=args.reps)
                except Exception as e:
                    print(f"   dg G={g:2d} cum={cum:4s}: FAIL "
                          f"{type(e).__name__}", flush=True)
                    continue
                mark = ""
                if v > best_dg.get(d2, (0, None, None, False))[0]:
                    best_dg[d2] = (v, g, cum, v > base)
                    mark = " *"
                print(f"   dg G={g:2d} cum={cum:4s}: {v:7.1f} M it/s "
                      f"({v / base:4.2f}x){mark}", flush=True)
        if d2 in best_dg:
            v, g, cum, _won = best_dg[d2]
            print(f"   => best dg: G={g} cum={cum} {v:.1f} "
                  f"({v / base:.2f}x of auto)", flush=True)

    print("\nTUNED_DG candidates (width: group, ONLY where dg beat "
          "auto):")
    print({d2: g for d2, (v, g, c, won) in sorted(best_dg.items())
           if won})


if __name__ == "__main__":
    main()
