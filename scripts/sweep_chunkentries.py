"""HW sweep: entries-per-kernel-dispatch (chunk size) on the large-DB
sustained workload (14291-entry ASTRAL-like mix, 8-SSE query, r=128).

Per-chunk cost = one pallas_call launch + its glue ops; larger chunks
amortize it over more entries but compile separate (E, d2) kernel
shapes.  Usage: python scripts/sweep_chunkentries.py [sizes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import BASELINE_LARGE, synthetic_entries  # noqa: E402
from cuda_satabsearch_tpu.io.pack import pack_query  # noqa: E402
from cuda_satabsearch_tpu.io.parser import parse_search_input  # noqa: E402
from cuda_satabsearch_tpu.session import (SearchSession,  # noqa: E402
                                          SessionConfig)

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [128, 256, 512]
    restarts = 128
    nq = 64

    with open(os.path.join(FIXTURES, "d1ubia_.input")) as fp:
        query = pack_query(parse_search_input(fp).queries[0])
    entries = synthetic_entries(14291)

    for ce in sizes:
        t0 = time.perf_counter()
        sess = SearchSession("<synthetic>", SessionConfig(
            maxstart=restarts, backend="pallas", chunk_entries=ce),
            entries=entries)
        nchunks = sum(len(sess.device_db[bi]["pallas"]["chunks"])
                      for bi in sess.device_db)
        print(f"# ce={ce}: {nchunks} chunks, session up in "
              f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)
        t0 = time.perf_counter()
        sess.search_many([query] * nq)
        print(f"# ce={ce}: warm-up {time.perf_counter() - t0:.1f} s",
              file=sys.stderr)
        iters = sess.nentries * restarts * sess.config.params.maxiter
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sess.search_many([query] * nq)
            best = min(best, time.perf_counter() - t0)
        rate = iters * nq / best / 1e6
        print(f"ce={ce:5d}  {rate:8.1f} M it/s "
              f"({rate / BASELINE_LARGE:.3f}x of A100 large baseline)  "
              f"[{nchunks} dispatches/query-tile]")


if __name__ == "__main__":
    main()
