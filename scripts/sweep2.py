"""Trustworthy per-chunk kernel timing/sweep: scan the kernel T times
per dispatch, reduce scores to ONE scalar on device, and drain it with
device_get (a real D2H round trip — block_until_ready alone is not a
reliable completion barrier through the axon tunnel).

Usage:
  python scripts/sweep2.py            # time current configs, n1=8
  python scripts/sweep2.py --sweep    # sweep (G, fetch, cum) per bucket
  python scripts/sweep2.py --n1 19    # other query sizes
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
from cuda_satabsearch_tpu.io.parser import read_database, parse_search_input
from cuda_satabsearch_tpu.io.pack import pack_database, pack_query
from cuda_satabsearch_tpu.ops.pallas_search import prepare_bucket_pallas2
from cuda_satabsearch_tpu.ops.common import prepare_query, round8
from cuda_satabsearch_tpu.ops.pallas_sa2 import (
    make_pallas2_bucket_search, make_qb2)
from cuda_satabsearch_tpu.ops.search import choose_chains

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")
T = 16  # kernel passes per dispatch


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


def time_chunk(ch, d2, n1, qtypes, qtabp, qdmat, c_par, r_seq,
               group=None, fetch="auto", cum="auto", lorder=True,
               reps=4):
    E = ch["size"]
    kern, G = make_pallas2_bucket_search(
        E, n1, d2, c_par, r_seq, lorder, rng_mode="pltpu",
        lsoln=False, fetch=fetch, group=group, cum=cum)
    qb2t, qb2d = make_qb2(qtabp, qdmat, G)
    idx = jnp.asarray(np.asarray(ch["indices"]), jnp.int32)

    def body(_, tag):
        rng_in = jnp.concatenate([
            jnp.full((1,), 1234, jnp.int32), tag[None], idx])
        s, _m = kern(ch["n2"], jnp.asarray(qtypes), qb2t, qb2d,
                     ch["types2"], ch["tab2p"], ch["dmat2"], rng_in)
        return None, jnp.sum(s)

    @jax.jit
    def run(tags):
        _, ss = jax.lax.scan(body, None, tags)
        return jnp.sum(ss)

    tags = jnp.arange(T, dtype=jnp.int32)
    chk = int(jax.device_get(run(tags)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        v = int(jax.device_get(run(tags)))
        best = min(best, time.perf_counter() - t0)
    assert v == chk
    return best / T, G, chk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--buckets", type=int, nargs="*", default=None,
                    help="restrict sweep to these d2 caps")
    args = ap.parse_args()
    enable_compile_cache()

    entries = read_database(
        os.path.join(FIX, "tableauxdistmatrixdb.small.ascii"))
    db = pack_database(entries)
    maxstart = 128
    c_par, r_seq = choose_chains(maxstart)
    n1 = args.n1
    query = pick_query(entries, n1)
    n1r = round8(query.order)
    qtypes, _qtv, qtabp, qdmat = prepare_query(query, n1r)

    # dispatch floor: null scan program
    @jax.jit
    def null(tags):
        return jnp.sum(tags)
    jax.device_get(null(jnp.arange(T, dtype=jnp.int32)))
    t0 = time.perf_counter()
    for _ in range(4):
        jax.device_get(null(jnp.arange(T, dtype=jnp.int32)))
    floor = (time.perf_counter() - t0) / 4
    print(f"dispatch+drain floor: {floor*1e3:.2f} ms (subtracted)",
          file=sys.stderr)

    total_t = 0.0
    total_real = 0
    for bucket in db.buckets:
        if args.buckets and bucket.dim not in args.buckets:
            continue
        darr = prepare_bucket_pallas2(bucket)
        for ch in darr["chunks"]:
            E, d2 = ch["size"], bucket.dim
            nreal = ch["end"] - ch["start"]
            if args.sweep:
                best = None
                for group in (4, 8, 16, 32):
                    if group > E or E % group or group * n1r > 512:
                        continue
                    for fetch in ("bd", "gdot"):
                        if fetch == "bd" and group * d2 > 512:
                            continue
                        for cum in ("roll", "mxu"):
                            try:
                                dt, G, _ = time_chunk(
                                    ch, d2, n1, qtypes, qtabp, qdmat,
                                    c_par, r_seq, group=group,
                                    fetch=fetch, cum=cum)
                            except Exception as e:
                                print(f"d2={d2} G={group} {fetch} {cum}: "
                                      f"FAIL {type(e).__name__}",
                                      file=sys.stderr)
                                continue
                            dt -= floor / T
                            tag = ""
                            if best is None or dt < best[0]:
                                best = (dt, group, fetch, cum)
                                tag = " *"
                            print(f"d2={d2:3d} E={E:3d} G={group:2d} "
                                  f"{fetch:5s} {cum:4s}: {dt*1e3:7.3f} ms"
                                  f"{tag}", file=sys.stderr)
                if best:
                    print(f"  -> best d2={d2} E={E}: G={best[1]} "
                          f"{best[2]} {best[3]} {best[0]*1e3:.3f} ms",
                          file=sys.stderr)
                    total_t += best[0]
                    total_real += nreal
            else:
                dt, G, _ = time_chunk(ch, d2, n1, qtypes, qtabp, qdmat,
                                      c_par, r_seq)
                dt -= floor / T
                iters = nreal * maxstart * 100
                steps = (E // G) * r_seq
                print(f"d2={d2:3d} E={E:3d} (real {nreal:3d}) G={G:2d} "
                      f"steps={steps:2d}: {dt*1e3:7.3f} ms "
                      f"{iters/dt/1e6:8.1f} M it/s  "
                      f"{dt*1e6/steps:7.2f} us/step", file=sys.stderr)
                total_t += dt
                total_real += nreal
    if total_real:
        iters = total_real * maxstart * 100
        print(f"n1={n1} TOTAL {total_real} entries {total_t*1e3:.2f} ms "
              f"= {iters/total_t/1e6:.1f} M it/s "
              f"(A100 small-db: 1264.7)", file=sys.stderr)


if __name__ == "__main__":
    main()
