"""Per-bucket steady-state kernel timing for the 586-entry benchmark DB.

Times each (E, d2) chunk's single-dispatch v2 kernel separately so we
can see where the per-query device time goes.  stderr diagnostics only.
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

    total_entries = 0
    total_time = 0.0
    for bucket in db.buckets:
        darr = prepare_bucket_pallas2(bucket)
        for ch in darr["chunks"]:
            E, d2 = ch["size"], bucket.dim
            kern, G = make_pallas2_bucket_search(
                E, n1, d2, c_par, r_seq, True, rng_mode="pltpu",
                lsoln=False)
            qb2t, qb2d = make_qb2(qtabp, qdmat, G)
            rng_in = jnp.concatenate([
                jnp.asarray(1234, jnp.int32)[None],
                jnp.asarray(0, jnp.int32)[None],
                jnp.asarray(np.asarray(ch["indices"]), jnp.int32)])
            args = (ch["n2"], jnp.asarray(qtypes), qb2t, qb2d, ch["types2"],
                    ch["tab2p"], ch["dmat2"], rng_in)
            fn = jax.jit(kern)
            out = fn(*args)
            jax.block_until_ready(out)
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps
            nreal = ch["end"] - ch["start"]
            iters = nreal * maxstart * 100
            print(f"bucket d2={d2:3d} E={E:3d} (real {nreal:3d}) G={G:2d} "
                  f"grid=({E//G},{r_seq}) : {dt*1e3:7.3f} ms  "
                  f"{iters/dt/1e6:8.1f} M it/s  "
                  f"{dt*1e6/(E//G*r_seq):7.2f} us/gridstep",
                  file=sys.stderr)
            total_entries += nreal
            total_time += dt
    iters = total_entries * maxstart * 100
    print(f"TOTAL {total_entries} entries, {total_time*1e3:.2f} ms "
          f"= {iters/total_time/1e6:.1f} M it/s", file=sys.stderr)

if __name__ == "__main__":
    main()
