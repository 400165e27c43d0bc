"""Sweep (group, fetch) configs per bucket shape of the 586-entry
benchmark on real hardware.  stderr diagnostics only."""
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
from cuda_satabsearch_tpu.ops.pallas_sa import prepare_query, round8
from cuda_satabsearch_tpu.ops.pallas_sa2 import (
    make_pallas2_bucket_search, make_qb2)
from cuda_satabsearch_tpu.ops.search import choose_chains

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def main():
    entries = read_database(
        os.path.join(FIX, "tableauxdistmatrixdb.small.ascii"))
    with open(os.path.join(FIX, "d1ubia_.input")) as f:
        sin = parse_search_input(f)
    query = pack_query(sin.queries[0])
    db = pack_database(entries)
    n1 = query.order
    n1r = round8(n1)
    maxstart = 128
    c_par, r_seq = choose_chains(maxstart)
    qtypes, _qtv, qtabp, qdmat = prepare_query(query, n1r)

    # measure the dispatch floor with a trivial jit
    nul = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128))
    jax.block_until_ready(nul(x))
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        x = nul(x)
    jax.block_until_ready(x)
    floor = (time.perf_counter() - t0) / reps
    print(f"dispatch floor: {floor*1e3:.3f} ms", file=sys.stderr)

    for bucket in db.buckets:
        darr = prepare_bucket_pallas2(bucket)
        ch = darr["chunks"][0]
        E, d2 = ch["size"], bucket.dim
        nreal = ch["end"] - ch["start"]
        best = None
        for group in (1, 2, 4, 8, 16):
            if group > E or E % group:
                continue
            for fetch in ("bd", "gdot"):
                if fetch == "bd" and group * d2 > 256:
                    continue
                try:
                    kern, G = make_pallas2_bucket_search(
                        E, n1, d2, c_par, r_seq, True, rng_mode="pltpu",
                        lsoln=False, fetch=fetch, group=group)
                    qb2 = make_qb2(qtabp, qdmat, G)
                    qtv = jnp.tile(jnp.asarray(qtypes, jnp.int32)[:, None],
                                   (G, 1))
                    rng_in = jnp.concatenate([
                        jnp.asarray(1234, jnp.int32)[None],
                        jnp.asarray(0, jnp.int32)[None],
                        jnp.asarray(np.asarray(ch["indices"]), jnp.int32)])
                    args = (ch["n2"], jnp.asarray(qtypes), qtv, qb2,
                            ch["types2"], ch["tab2p"], ch["dmat2"], rng_in)
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
                    print(f"d2={d2:3d} E={E:3d} G={group:2d} {fetch:5s}: "
                          f"FAIL {type(e).__name__}", file=sys.stderr)
                    continue
                iters = nreal * maxstart * 100
                mits = iters / dt / 1e6
                tag = ""
                if best is None or dt < best[0]:
                    best = (dt, group, fetch)
                    tag = " *"
                print(f"d2={d2:3d} E={E:3d} G={group:2d} {fetch:5s}: "
                      f"{dt*1e3:7.3f} ms  {mits:8.1f} M it/s{tag}",
                      file=sys.stderr)
        if best:
            print(f"  -> best d2={d2}: G={best[1]} {best[2]} "
                  f"{best[0]*1e3:.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
