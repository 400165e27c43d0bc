"""Config sweep with the in-program methodology: each candidate
(G, fetch, cum) is timed as the EXACT production shape — the K-query
batched kernel (query grid axis) jitted standalone, scalar-reduced,
drained with device_get, floor-subtracted.  The older sweep2 timing
(lax.scan of the same kernel) reads ~20-30% low and mis-ranks configs.

Usage:
  python scripts/sweep3.py [--n1 8] [--buckets 8 16 24] [--time-only]
stderr only.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cuda_satabsearch_tpu.core.cache import enable_compile_cache

enable_compile_cache()

from cuda_satabsearch_tpu.io.parser import read_database, parse_search_input
from cuda_satabsearch_tpu.io.pack import pack_database, pack_query
from cuda_satabsearch_tpu.ops.pallas_search import prepare_bucket_pallas2
from cuda_satabsearch_tpu.ops.common import prepare_query, round8
from cuda_satabsearch_tpu.ops.pallas_sa2 import (
    make_pallas2_bucket_search, make_qb2_batched)
from cuda_satabsearch_tpu.ops.search import choose_chains

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")
K = 32


def pick_query(entries, n1):
    if n1 == 8:
        with open(os.path.join(FIX, "d1ubia_.input")) as f:
            return pack_query(parse_search_input(f).queries[0])
    for e in sorted(entries, key=lambda e: e.order):
        if e.order >= n1:
            sub = type(e)(name=f"q{n1}", order=n1, tabhi=e.tabhi[:n1, :n1],
                          tablo=e.tablo[:n1, :n1], types=e.types[:n1],
                          dmat=e.dmat[:n1, :n1])
            return pack_query(sub)
    raise SystemExit(f"no entry of order >= {n1}")


def time_config(ch, d2, n1, qts, qtabps, qdmats, c_par, r_seq, floor,
                group=None, fetch="auto", cum="auto", reps=4):
    E = ch["size"]
    n1r = round8(n1)
    kern, G = make_pallas2_bucket_search(
        E, n1, d2, c_par, r_seq, True, rng_mode="pltpu", lsoln=False,
        fetch=fetch, group=group, cum=cum, nq=K, batched_api=True)
    qb2t, qb2d = make_qb2_batched(np.asarray(qtabps), np.asarray(qdmats), G)
    tags = jnp.arange(K, dtype=jnp.int32)
    rng_in = jnp.concatenate([
        jnp.full((1,), 1234, jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.asarray(np.asarray(ch["indices"]), jnp.int32)])

    @jax.jit
    def run():
        s, _m = kern(ch["n2"], jnp.asarray(qts, jnp.int32), qb2t,
                     qb2d, ch["types2"], ch["tab2p"], ch["dmat2"],
                     rng_in, tags)
        return jnp.sum(s)

    chk = int(jax.device_get(run()))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        v = int(jax.device_get(run()))
        best = min(best, time.perf_counter() - t0)
    assert v == chk
    return (best - floor) / K, G


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--buckets", type=int, nargs="*", default=None)
    ap.add_argument("--time-only", action="store_true",
                    help="time current auto configs, no sweep")
    args = ap.parse_args()

    entries = read_database(
        os.path.join(FIX, "tableauxdistmatrixdb.small.ascii"))
    db = pack_database(entries)
    maxstart = 128
    c_par, r_seq = choose_chains(maxstart)
    n1 = args.n1
    query = pick_query(entries, n1)
    n1r = round8(query.order)
    qtypes, _qtv, qtabp, qdmat = prepare_query(query, n1r)
    qts = np.stack([qtypes] * K)
    qtabps = np.stack([qtabp] * K)
    qdmats = np.stack([qdmat] * K)

    @jax.jit
    def null(t):
        return jnp.sum(t)

    t = jnp.arange(K, dtype=jnp.int32)
    jax.device_get(null(t))
    t0 = time.perf_counter()
    for _ in range(4):
        jax.device_get(null(t))
    floor = (time.perf_counter() - t0) / 4
    print(f"floor {floor*1e3:.2f} ms", file=sys.stderr)

    total = 0.0
    total_real = 0
    for bucket in db.buckets:
        if args.buckets and bucket.dim not in args.buckets:
            continue
        darr = prepare_bucket_pallas2(bucket)
        for ch in darr["chunks"]:
            E, d2 = ch["size"], bucket.dim
            nreal = ch["end"] - ch["start"]
            if args.time_only:
                dt, G = time_config(ch, d2, n1, qts, qtabps, qdmats,
                                    c_par, r_seq, floor)
                total += dt
                total_real += nreal
                print(f"E={E:3d} d2={d2:3d} real={nreal:3d} G={G:2d}: "
                      f"{dt*1e3:7.3f} ms/q "
                      f"{nreal*maxstart*100/dt/1e6:8.1f} M it/s",
                      file=sys.stderr)
                continue
            best = None
            for group in (2, 4, 8, 16, 32):
                if group > E or E % group or group * n1r > 512:
                    continue
                for fetch in ("bd", "gdot"):
                    if fetch == "bd" and group * d2 > 512:
                        continue
                    for cum in ("roll", "mxu"):
                        try:
                            dt, G = time_config(
                                ch, d2, n1, qts, qtabps, qdmats, c_par,
                                r_seq, floor, group=group, fetch=fetch,
                                cum=cum)
                        except Exception as e:
                            print(f"d2={d2} G={group} {fetch} {cum}: FAIL "
                                  f"{type(e).__name__}", file=sys.stderr)
                            continue
                        tag = ""
                        if best is None or dt < best[0]:
                            best = (dt, group, fetch, cum)
                            tag = " *"
                        print(f"d2={d2:3d} E={E:3d} G={group:2d} {fetch:5s}"
                              f" {cum:4s}: {dt*1e3:7.3f} ms/q{tag}",
                              file=sys.stderr)
            if best:
                print(f"  -> best d2={d2} E={E}: G={best[1]} {best[2]} "
                      f"{best[3]} {best[0]*1e3:.3f} ms/q", file=sys.stderr)
                total += best[0]
                total_real += nreal
    if total_real:
        iters = total_real * maxstart * 100
        print(f"n1={n1} TOTAL {total_real} entries {total*1e3:.2f} ms/q = "
              f"{iters/total/1e6:.1f} M it/s (A100 small-db: 1264.7)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
