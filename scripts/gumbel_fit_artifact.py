"""Fit Gumbel statistics on THIS framework's real score distributions
and compare against the reference's shipped constants.

The reference's z/p statistics hard-code (a, b) = (0.3780327676087335,
0.3582596175507505), an MLE fit of norm2 null scores at 4096 restarts
(/root/reference/nvcc_src_current/gumbelstats.h:21-23, fit by
scripts/fitgumbeldist.r over query200 .slrtab files).  This script
reproduces the methodology on the bundled data: a >= 20-query sample
drawn from the 586-entry small DB itself, STRATIFIED BY SIZE REGIME
proportionally to the DB's own size mix (the reference's query200 list
is class-proportional over SCOP; no SCOP dir.cla ships in this
environment, and size is the variable the norm2 normalization and the
fit actually respond to), each at r=4096, norm2 scores with self +
top hits dropped (null-dominated sample), MLE fit via eval/gumbelfit.py
(the same estimator fitgumbeldist.r uses).  Reports per-query,
per-size-regime, and pooled parameters; written to
eval_artifacts/gumbel_fit.md.

Usage: python scripts/gumbel_fit_artifact.py [--restarts 4096]
                                             [--nqueries 24]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")
ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "eval_artifacts")
REF_A, REF_B = 0.3780327676087335, 0.3582596175507505  # gumbelstats.h:21-23

REGIMES = ((2, 8), (9, 16), (17, 32), (33, 111))


def sample_queries(db, n, seed=11):
    """Size-stratified sample of DB entry names, proportional to the
    DB's own size-regime mix, deterministic."""
    rng = np.random.default_rng(seed)
    orders = np.asarray(db.orders)
    names = list(db.names)
    picks = []
    for lo, hi in REGIMES:
        pool = [i for i in range(len(names))
                if lo <= orders[i] <= hi and orders[i] >= 3]
        k = max(1, round(n * len(pool) / len(names)))
        k = min(k, len(pool))
        idx = rng.choice(len(pool), size=k, replace=False)
        picks.extend(pool[i] for i in sorted(idx))
    return [names[i] for i in picks]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=4096)
    ap.add_argument("--nqueries", type=int, default=24)
    ap.add_argument("--drop-top", type=int, default=5,
                    help="top hits per query excluded from the null fit")
    args = ap.parse_args()

    from cuda_satabsearch_tpu.eval.gumbelfit import fit_gumbel
    from cuda_satabsearch_tpu.session import SearchSession, SessionConfig
    from cuda_satabsearch_tpu.stats.gumbel import norm2

    dbfile = os.path.join(FIXTURES, "tableauxdistmatrixdb.small.ascii")
    sess = SearchSession(dbfile, SessionConfig(maxstart=args.restarts))
    qnames = sample_queries(sess.db, args.nqueries)
    queries = [sess.resolve_query(nm) for nm in qnames]
    queries = [q for q in queries if q is not None and q.order >= 3]
    print(f"# {len(queries)} size-stratified queries x "
          f"r={args.restarts} vs {sess.nentries} entries",
          file=sys.stderr)

    t0 = time.perf_counter()
    results = sess.search_many(queries, lorder=True)
    print(f"# search: {time.perf_counter() - t0:.1f} s", file=sys.stderr)

    def null_sample(q, res):
        n2s = np.asarray([
            norm2(s, q.order, res.orders[i])
            for i, s in enumerate(res.scores)], dtype=np.float64)
        # null sample: drop self + the strongest hits (the reference's
        # slrtab fit uses SCOP-labelled negatives; on the bundled DB
        # the non-top scores are null-dominated the same way)
        order = np.argsort(n2s)[::-1]
        keep = np.ones(len(n2s), bool)
        keep[order[:args.drop_top]] = False
        for i, name in enumerate(res.names):
            if name.lower() == q.name.lower():
                keep[i] = False
        return n2s[keep]

    per_query = []
    by_regime = {r: [] for r in REGIMES}
    pooled = []
    for q, res in zip(queries, results):
        null = null_sample(q, res)
        a, b = fit_gumbel(null)
        per_query.append((q.name, q.order, a, b, null.size))
        for r in REGIMES:
            if r[0] <= q.order <= r[1]:
                by_regime[r].append(null)
        pooled.append(null)

    allnull = np.concatenate(pooled)
    a_all, b_all = fit_gumbel(allnull)

    os.makedirs(ART, exist_ok=True)
    out = os.path.join(ART, "gumbel_fit.md")
    with open(out, "w") as fh:
        fh.write(
            "# Gumbel fit on this framework's score distributions\n\n"
            f"{len(queries)} queries sampled from the 586-entry small "
            "DB, stratified by size regime\nproportionally to the DB's "
            "own size mix (the class-proportional query200\nprotocol's "
            "substitute — no SCOP dir.cla ships in this environment; "
            "size is the\nvariable norm2 and the fit respond to), "
            f"r={args.restarts}, norm2 scores,\n"
            f"top-{args.drop_top}+self dropped per query (null sample); "
            "MLE fit = eval/gumbelfit.py\n(the same estimator the "
            "reference's fitgumbeldist.r implements).\n\n"
            "| query | n1 | a (loc) | b (scale) | n |\n"
            "|---|---|---|---|---|\n")
        for name, n1, a, b, n in per_query:
            fh.write(f"| {name} | {n1} | {a:.4f} | {b:.4f} | {n} |\n")
        fh.write("\nPer size regime (pooled nulls of the regime's "
                 "queries):\n\n"
                 "| regime (n1) | queries | a (loc) | b (scale) | n |\n"
                 "|---|---|---|---|---|\n")
        for r in REGIMES:
            nulls = by_regime[r]
            if not nulls:
                continue
            rn = np.concatenate(nulls)
            ra, rb = fit_gumbel(rn)
            fh.write(f"| {r[0]}-{r[1]} | {len(nulls)} | {ra:.4f} | "
                     f"{rb:.4f} | {rn.size} |\n")
        fh.write(
            f"\n**Pooled: a = {a_all:.4f}, b = {b_all:.4f}** over "
            f"{allnull.size} null scores from {len(queries)} queries."
            f"\n\nReference constants (gumbelstats.h:21-23, query200 vs "
            f"ASTRAL at r=4096):\na = {REF_A:.4f}, b = {REF_B:.4f}.  "
            f"Pooled delta: da = {a_all - REF_A:+.4f}, "
            f"db = {b_all - REF_B:+.4f}.\n\nThe per-regime rows show "
            "how the fit moves with query size on a 586-entry DB;\n"
            "the reference's own fit varies comparably between its "
            "datasets (see the\nFischer-fit comments in "
            "fitgumbeldist.r).\n")
    print(open(out).read())


if __name__ == "__main__":
    main()
