"""Warm single-query latency budget: split the per-query wall time
into dispatch (host -> device, async), device compute, and drain
(device -> host round trip) — the committed breakdown VERDICT round 3
asked for.

Method: warm everything, then time (a) dispatch_db_pallas2 alone (the
async call returns as soon as the program is enqueued), (b) dispatch +
assemble (the full search), (c) the device-only rate from a pipelined
K-query stream (one drain amortized over K queries bounds device time
per query from above).  All timings drain-based where a result is
consumed (np.asarray; block_until_ready lies on axon).

Usage: python scripts/latency_budget.py [--restarts 128] [--reps 7]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=128)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--lsoln", action="store_true",
                    help="include SSE maps in the drain (CLI default)")
    args = ap.parse_args()

    from cuda_satabsearch_tpu.io.pack import pack_query
    from cuda_satabsearch_tpu.io.parser import parse_search_input
    from cuda_satabsearch_tpu.ops.pallas_search import (
        assemble_db_pallas2, dispatch_db_pallas2)
    from cuda_satabsearch_tpu.session import SearchSession, SessionConfig

    with open(os.path.join(FIXTURES, "d1ubia_.input")) as fp:
        sin = parse_search_input(fp)
    query = pack_query(sin.queries[0])
    sess = SearchSession(
        os.path.join(FIXTURES, "tableauxdistmatrixdb.small.ascii"),
        SessionConfig(maxstart=args.restarts))
    cfg = sess.config
    kw = dict(maxstart=cfg.maxstart, lorder=True, seed=cfg.seed,
              c_max=cfg.c_max, device_db=sess.device_db,
              lsoln=args.lsoln)

    # warm every program involved
    assemble_db_pallas2(dispatch_db_pallas2(query, sess.db,
                                            query_tag=0, **kw))

    def best(f, n=args.reps):
        b = float("inf")
        for i in range(n):
            t0 = time.perf_counter()
            f(i)
            b = min(b, time.perf_counter() - t0)
        return b * 1e3

    t_disp = best(lambda i: dispatch_db_pallas2(query, sess.db,
                                                query_tag=100 + i, **kw))
    t_full = best(lambda i: assemble_db_pallas2(
        dispatch_db_pallas2(query, sess.db, query_tag=200 + i, **kw)))

    # device-only upper bound: K pipelined queries, one drain (same
    # lsoln configuration as the single-query timings above)
    K = 64
    sess.search_many([query] * K, lsoln=args.lsoln)  # warm the K-tile
    t0 = time.perf_counter()
    sess.search_many([query] * K, lsoln=args.lsoln)
    t_dev = (time.perf_counter() - t0) / K * 1e3

    iters = sess.nentries * cfg.maxstart * cfg.params.maxiter
    print(f"\nwarm single-query budget (586-entry DB, 8-SSE query, "
          f"r={cfg.maxstart}, lsoln={args.lsoln}):")
    print(f"  dispatch (async enqueue)        {t_disp:6.1f} ms")
    print(f"  full search (dispatch + drain)  {t_full:6.1f} ms "
          f"({iters / t_full / 1e3:.0f} M it/s)")
    print(f"  drain share (full - dispatch)   {t_full - t_disp:6.1f} ms"
          f"  <- one packed D2H round trip through the tunnel")
    print(f"  device time/query (K={K} stream) {t_dev:6.1f} ms "
          f"({iters / t_dev / 1e3:.0f} M it/s sustained)")
    print(f"  unattributed host/queue          "
          f"{t_full - t_disp - t_dev:6.1f} ms")


if __name__ == "__main__":
    main()
