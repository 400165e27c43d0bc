"""Accurate per-bucket steady-state kernel timing: scan each (E, d2)
chunk's v2 kernel K times inside ONE dispatch, so dispatch overhead is
amortized to nothing and the per-step time is pure device time.

Usage: python scripts/profile_buckets2.py [n1 ...]   (default: 8)
stderr diagnostics only.
"""
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
    make_pallas2_bucket_search, make_qb2)
from cuda_satabsearch_tpu.ops.search import choose_chains

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")
K = 32  # scan length (queries per dispatch)


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
               reps=5):
    E = ch["size"]
    kern, G = make_pallas2_bucket_search(
        E, n1, d2, c_par, r_seq, lorder, rng_mode="pltpu",
        lsoln=False, fetch=fetch, group=group, cum=cum)
    qb2t, qb2d = make_qb2(qtabp, qdmat, G)
    idx = jnp.asarray(np.asarray(ch["indices"]), jnp.int32)

    def body(_, tag):
        rng_in = jnp.concatenate([
            jnp.full((1,), 1234, jnp.int32), tag[None],
            idx])
        s, _m = kern(ch["n2"], jnp.asarray(qtypes), qb2t, qb2d,
                     ch["types2"], ch["tab2p"], ch["dmat2"], rng_in)
        return None, s

    @jax.jit
    def run():
        _, ss = jax.lax.scan(body, None, jnp.arange(K, dtype=jnp.int32))
        return ss

    out = jax.block_until_ready(run())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    return best / K, G  # seconds per single kernel pass


def main():
    n1s = [int(a) for a in sys.argv[1:]] or [8]
    entries = read_database(
        os.path.join(FIX, "tableauxdistmatrixdb.small.ascii"))
    db = pack_database(entries)
    maxstart = 128
    c_par, r_seq = choose_chains(maxstart)
    for n1 in n1s:
        query = pick_query(entries, n1)
        n1r = round8(query.order)
        qtypes, _qtv, qtabp, qdmat = prepare_query(query, n1r)
        total_t = 0.0
        total_real = 0
        for bucket in db.buckets:
            darr = prepare_bucket_pallas2(bucket)
            for ch in darr["chunks"]:
                E, d2 = ch["size"], bucket.dim
                nreal = ch["end"] - ch["start"]
                dt, G = time_chunk(ch, d2, query.order, qtypes, qtabp,
                                   qdmat, c_par, r_seq)
                iters = nreal * maxstart * 100
                steps = (E // G) * r_seq
                print(f"n1={n1} d2={d2:3d} E={E:3d} (real {nreal:3d}) "
                      f"G={G:2d} steps={steps:2d}: {dt*1e3:7.3f} ms "
                      f"{iters/dt/1e6:8.1f} M it/s  "
                      f"{dt*1e6/steps:7.2f} us/step", file=sys.stderr)
                total_t += dt
                total_real += nreal
        iters = total_real * maxstart * 100
        print(f"n1={n1} TOTAL {total_real} entries {total_t*1e3:.2f} ms = "
              f"{iters/total_t/1e6:.1f} M it/s "
              f"(A100 small-db baseline 1264.7)", file=sys.stderr)


if __name__ == "__main__":
    main()
