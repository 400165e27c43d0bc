"""HW sweep: "dgp" (packed single-gather dg) vs the adopted "dg"
fetch, per bucket width.

dgp fuses tableau code + bf16-grid distance into ONE f32 per element
(pack_qc format), halving the gathered data per iteration (6 [DQ, C]
gathers -> 3) at the cost of ~4 unpack VPU ops per fetched plane.
Direct kernel calls, pltpu RNG, drain-based timing (np.asarray —
block_until_ready lies on axon).

Usage: python scripts/sweep_dgp.py [--n1 8] [--widths 8,16,...]
                                   [--groups 4,8,16]
Winners go into pallas_sa2.TUNED_DGP.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sweep_dg import WIDTHS, bench_config  # noqa: E402


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
    ap.add_argument("--groups", default="4,8,16")
    args = ap.parse_args()
    warm_backend()

    groups = [int(g) for g in args.groups.split(",")]
    best = {}
    for d2 in (int(w) for w in args.widths.split(",")):
        E = 128 if d2 <= 32 else 64
        rseq = max(args.rseq, min(192, -(-120_000_000
                                         // (E * 128 * 100))))
        base, gb = bench_config(E, args.n1, d2, fetch="auto", group=None,
                                cum="auto", r_seq=rseq, reps=args.reps)
        print(f"d2={d2:3d} E={E:3d} rseq={rseq} auto(G={gb:2d}): "
              f"{base:7.1f} M it/s", flush=True)
        for g in groups:
            if g > E:
                continue
            try:
                v, _ = bench_config(E, args.n1, d2, fetch="dgp",
                                    group=g, cum="mxu",
                                    r_seq=rseq, reps=args.reps)
            except Exception as e:
                print(f"   dgp G={g:2d}: FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
                continue
            mark = ""
            if v > best.get(d2, (0, None, False))[0]:
                best[d2] = (v, g, v > base)
                mark = " *"
            print(f"   dgp G={g:2d}: {v:7.1f} M it/s "
                  f"({v / base:4.2f}x){mark}", flush=True)
        if d2 in best:
            v, g, _won = best[d2]
            print(f"   => best dgp: G={g} {v:.1f} ({v / base:.2f}x "
                  f"of auto)", flush=True)

    print("\nTUNED_DGP candidates (width: group, ONLY where dgp beat "
          "the auto/dg config):")
    print({d2: g for d2, (v, g, won) in sorted(best.items()) if won})


if __name__ == "__main__":
    main()
