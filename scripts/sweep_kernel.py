"""Sweep v2-kernel configs (group, fetch, cum) per bucket shape of the
586-entry benchmark on real hardware, for one or more query sizes.
stderr diagnostics only; prints a TUNED_CONFIG-style dict per n1 at
the end.

Usage: python scripts/sweep_kernel.py [n1 ...]   (default: 8)
Query sizes other than the fixture's 8 use a synthetic query built
from the first DB entry of >= that order.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cuda_satabsearch_tpu.io.parser import read_database, parse_search_input
from cuda_satabsearch_tpu.io.pack import pack_database, pack_query
from cuda_satabsearch_tpu.ops.pallas_search import prepare_bucket_pallas2
from cuda_satabsearch_tpu.ops.common import prepare_query, round8
from cuda_satabsearch_tpu.ops.pallas_sa2 import (
    make_pallas2_bucket_search, make_qb2)
from cuda_satabsearch_tpu.ops.search import choose_chains

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


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


def dispatch_floor():
    nul = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128))
    jax.block_until_ready(nul(x))
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        x = nul(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / reps


def sweep_n1(entries, db, n1, floor, maxstart=128):
    query = pick_query(entries, n1)
    n1r = round8(query.order)
    c_par, r_seq = choose_chains(maxstart)
    qtypes, _qtv, qtabp, qdmat = prepare_query(query, n1r)
    tuned = {}
    for bucket in db.buckets:
        darr = prepare_bucket_pallas2(bucket)
        ch = darr["chunks"][0]
        E, d2 = ch["size"], bucket.dim
        nreal = ch["end"] - ch["start"]
        best = None
        for group in (1, 2, 4, 8, 16, 32):
            if group > E or E % group or group * n1r > 512:
                continue
            for fetch in ("bd", "gdot"):
                if fetch == "bd" and group * d2 > 512:
                    continue
                for cum in ("roll", "mxu"):
                    try:
                        kern, G = make_pallas2_bucket_search(
                            E, query.order, d2, c_par, r_seq, True,
                            rng_mode="pltpu", lsoln=False, fetch=fetch,
                            group=group, cum=cum)
                        if G != group:
                            continue
                        qb2t, qb2d = make_qb2(qtabp, qdmat, G)
                            jnp.asarray(qtypes, jnp.int32)[:, None], (G, 1))
                        rng_in = jnp.concatenate([
                            jnp.asarray(1234, jnp.int32)[None],
                            jnp.asarray(0, jnp.int32)[None],
                            jnp.asarray(np.asarray(ch["indices"]),
                                        jnp.int32)])
                        args = (ch["n2"], jnp.asarray(qtypes), qb2t,
                                qb2d, ch["types2"], ch["tab2p"],
                                ch["dmat2"], rng_in)
                        fn = jax.jit(kern)
                        out = fn(*args)
                        jax.block_until_ready(out)
                        reps = 30
                        t0 = time.perf_counter()
                        for _ in range(reps):
                            out = fn(*args)
                        jax.block_until_ready(out)
                        dt = (time.perf_counter() - t0) / reps - floor
                    except Exception as e:  # noqa
                        print(f"n1={n1} d2={d2:3d} E={E:3d} G={group:2d} "
                              f"{fetch:5s} {cum:4s}: FAIL "
                              f"{type(e).__name__}", file=sys.stderr)
                        continue
                    iters = nreal * maxstart * 100
                    mits = iters / dt / 1e6
                    tag = ""
                    if best is None or dt < best[0]:
                        best = (dt, group, fetch, cum)
                        tag = " *"
                    print(f"n1={n1} d2={d2:3d} E={E:3d} G={group:2d} "
                          f"{fetch:5s} {cum:4s}: {dt*1e3:7.3f} ms  "
                          f"{mits:8.1f} M it/s{tag}", file=sys.stderr)
        if best:
            tuned[d2] = (best[1], best[2], best[3])
            print(f"  -> best n1={n1} d2={d2}: G={best[1]} {best[2]} "
                  f"{best[3]} {best[0]*1e3:.3f} ms", file=sys.stderr)
    print(f"TUNED[{n1}] = {tuned}", file=sys.stderr)
    return tuned


def main():
    n1s = [int(a) for a in sys.argv[1:]] or [8]
    entries = read_database(
        os.path.join(FIX, "tableauxdistmatrixdb.small.ascii"))
    db = pack_database(entries)
    floor = dispatch_floor()
    print(f"dispatch floor: {floor*1e3:.3f} ms", file=sys.stderr)
    for n1 in n1s:
        sweep_n1(entries, db, n1, floor)


if __name__ == "__main__":
    main()
