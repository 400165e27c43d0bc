"""Benchmark vs the reference's recorded baselines — ALL shapes by
default, so the driver-captured ledger certifies every claimed number:

  586db          586-entry DB (tableauxdistmatrixdb.small.ascii),
                 8-SSE ubiquitin query, r=128, 100 iterations.
                 Baseline: NVIDIA A100-PCIE-40GB, 1264.7 M it/s
                 (README_example_usage.txt:84-85; BASELINE.md).
  large14291     synthetic 14291-entry ASTRAL-like DB, same query.
                 Baseline: A100 full-ASTRAL, 1903.2 M it/s
                 (README_example_usage.txt:241-242).
  bigquery       19-SSE d2phlb1 query at r=4096 on the 586-entry DB.
                 Baseline: Tesla M2070, 145.3 M it/s
                 (old/nvcc_src_cuda5/gpucudaSaTabsearch_fermi.e1462444).

Prints ONE JSON line.  The headline metric is the 586db SUSTAINED
throughput — a pipelined multi-query stream with host round trips
amortized, the closest equivalent of the reference's kernel-only GPU
timing (its baselines exclude all host work and D2H) — with the
per-query, large-DB, and big-query numbers as extra fields:

  {"metric": "sa_search_throughput_586db_8sse_r128_sustained",
   "value": N, "unit": "M it/s", "vs_baseline": N,
   "per_query_m_it_s": ..., "per_query_vs_baseline": ...,
   "large14291_m_it_s": ..., "large14291_vs_baseline": ...,
   "bigquery_r4096_m_it_s": ..., "bigquery_r4096_vs_baseline": ...}

Flags: --skip-large / --skip-big-query for a quick headline-only run;
--large N overrides the synthetic DB size; --restarts / --backend as
before; --paritycheck runs the on-HW bitwise gate instead.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "fixtures")
BASELINE_M_IT_S = 1264.7  # A100, same workload (README_example_usage.txt:85)
BASELINE_LARGE = 1903.2  # A100, 14291-entry ASTRAL (README_example:241-242)
BASELINE_BIGQ = 145.3  # M2070, 19-SSE r=4096 small pass (fermi.e1462444)
REPEATS = 5


def synthetic_entries(n):
    """ASTRAL-2.07-like SSE-count mix (median ~10, tail to 111)."""
    import numpy as np

    from cuda_satabsearch_tpu.io.parser import TableauEntry

    rng = np.random.default_rng(0)
    orders = np.clip(rng.lognormal(2.35, 0.55, size=n).astype(int), 2, 111)
    out = []
    for i, o in enumerate(sorted(orders)):
        types = rng.integers(0, 4, size=o).astype(np.uint8)
        hi = np.triu(rng.integers(0, 4, size=(o, o)), 1).astype(np.uint8)
        hi = hi + hi.T
        lo = np.triu(rng.integers(0, 4, size=(o, o)), 1).astype(np.uint8)
        lo = lo + lo.T
        np.fill_diagonal(hi, types)
        np.fill_diagonal(lo, types)
        d = np.triu(rng.random((o, o)) * 30.0, 1).astype(np.float32)
        d = (d + d.T).astype(np.float32)
        np.fill_diagonal(d, types.astype(np.float32))
        out.append(TableauEntry(name=f"syn{i:05d}", order=int(o), tabhi=hi,
                                tablo=lo, types=types, dmat=d))
    return out


def run_search(session, query, restarts, label, baseline, nq=384):
    """(per_query, sustained) M it/s for one workload shape.

    per_query includes a full dispatch+drain round trip (on this
    environment ~25 ms tunnel RTT per drain); sustained pipelines
    ``nq`` queries with one drain per tile, amortizing host cost —
    the basis comparable to the reference's kernel-only timing."""
    t0 = time.perf_counter()
    result = session.search(query, lorder=True, query_tag=0)
    print(f"# [{label}] warm-up (incl. compile): "
          f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)
    best = float("inf")
    for rep in range(REPEATS):
        t0 = time.perf_counter()
        result = session.search(query, lorder=True, query_tag=rep)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"# [{label}] rep {rep}: {dt * 1000:.1f} ms", file=sys.stderr)
    iters = session.nentries * restarts * session.config.params.maxiter
    m_it_s = iters / best / 1e6
    top = sorted(zip(result.scores, result.names), reverse=True)[:3]
    print(f"# [{label}] top hits: {[(n, int(s)) for s, n in top]}",
          file=sys.stderr)
    print(f"# [{label}] per-query {m_it_s:.1f} M it/s "
          f"({m_it_s / baseline:.3f}x of baseline)", file=sys.stderr)

    session.search_many([query] * nq)  # warm the batched-fn compile
    best_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        session.search_many([query] * nq)
        best_s = min(best_s, time.perf_counter() - t0)
    sustained = iters * nq / best_s / 1e6
    print(f"# [{label}] sustained ({nq} pipelined queries): "
          f"{sustained:.1f} M it/s ({sustained / baseline:.3f}x)",
          file=sys.stderr)
    return m_it_s, sustained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=128)
    ap.add_argument("--backend", default="auto",
                    choices=("auto", "pallas", "xla"))
    ap.add_argument("--large", type=int, default=14291,
                    help="synthetic large-DB entry count (default 14291, "
                         "the reference's full-ASTRAL size)")
    ap.add_argument("--skip-large", action="store_true",
                    help="headline 586db shape only")
    ap.add_argument("--big-query", action="store_true",
                    help=argparse.SUPPRESS)  # legacy; now the default
    ap.add_argument("--skip-big-query", action="store_true",
                    help="skip the 19-SSE r=4096 shape")
    ap.add_argument("--paritycheck", action="store_true",
                    help="run the on-HW bitwise parity gate "
                         "(scripts/hw_paritycheck.py) and write PARITY.json")
    args = ap.parse_args()

    if args.paritycheck:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        import jax
        from hw_paritycheck import run as parity_run

        t0 = time.perf_counter()
        parity_run()
        artifact = {
            "gate": "pallas-vs-xla bitwise (scores+maps), supplied RNG, "
                    "n1 in {8,19,101} x lorder; batched-vs-sequential in "
                    "supplied+pltpu modes incl. small-G (G%8!=0) pltpu",
            "result": "PASS",
            "backend": jax.default_backend(),
            "device": jax.devices()[0].device_kind,
            "seconds": round(time.perf_counter() - t0, 1),
        }
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "PARITY.json")
        with open(path, "w") as fp:
            json.dump(artifact, fp, indent=1)
            fp.write("\n")
        print(json.dumps({"metric": "hw_bitwise_parity", "value": 1,
                          "unit": "pass", "vs_baseline": 1.0}))
        return

    from cuda_satabsearch_tpu.io.pack import pack_query
    from cuda_satabsearch_tpu.io.parser import parse_search_input
    from cuda_satabsearch_tpu.session import SearchSession, SessionConfig

    with open(os.path.join(FIXTURES, "d1ubia_.input")) as fp:
        sin = parse_search_input(fp)
    query = pack_query(sin.queries[0])

    dbfile = os.path.join(FIXTURES, "tableauxdistmatrixdb.small.ascii")
    session = SearchSession(dbfile, SessionConfig(
        maxstart=args.restarts, backend=args.backend))
    print(f"# db: {session.nentries} entries, query: {query.name} "
          f"({query.order} SSEs), restarts: {args.restarts}, "
          f"backend: {args.backend}", file=sys.stderr)
    per_query, sustained = run_search(session, query, args.restarts,
                                      "586db", BASELINE_M_IT_S)

    out = {
        "metric": "sa_search_throughput_586db_8sse_r128_sustained",
        "value": round(sustained, 2),
        "unit": "M it/s",
        "vs_baseline": round(sustained / BASELINE_M_IT_S, 4),
        "per_query_m_it_s": round(per_query, 2),
        "per_query_vs_baseline": round(per_query / BASELINE_M_IT_S, 4),
    }

    if args.large and not args.skip_large:
        entries = synthetic_entries(args.large)
        big = SearchSession("<synthetic>", SessionConfig(
            maxstart=args.restarts, backend=args.backend), entries=entries)
        print(f"# large db: {big.nentries} entries (ASTRAL-like mix)",
              file=sys.stderr)
        # device time per query here is ~100 ms: 64 pipelined queries
        # already put the per-stream drain cost below 0.5%
        _, lsust = run_search(big, query, args.restarts,
                              f"large{args.large}", BASELINE_LARGE, nq=64)
        out[f"large{args.large}_m_it_s"] = round(lsust, 2)
        out[f"large{args.large}_vs_baseline"] = round(
            lsust / BASELINE_LARGE, 4)

    if not args.skip_big_query:
        with open(os.path.join(FIXTURES, "d2phlb1.input")) as fp:
            bq = pack_query(parse_search_input(fp).queries[0])
        sess4k = SearchSession(dbfile, SessionConfig(
            maxstart=4096, backend=args.backend))
        print(f"# big query: {bq.name} ({bq.order} SSEs), r=4096",
              file=sys.stderr)
        _, qsust = run_search(sess4k, bq, 4096, "d2phlb1_r4096",
                              BASELINE_BIGQ, nq=16)
        out["bigquery_r4096_m_it_s"] = round(qsust, 2)
        out["bigquery_r4096_vs_baseline"] = round(qsust / BASELINE_BIGQ, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
