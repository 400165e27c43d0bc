"""Warm-process startup attribution + AOT-serialization experiment.

Question (VERDICT r4 #4): a warm process (persistent XLA disk cache
populated) still pays 2-14 s of "[586db] warm-up" before its first
search.  Where does it go — Python tracing, compile-cache lookup,
remote-service round trips, or executable load — and can
jax.experimental.serialize_executable make a fresh process load
executables instead of recompiling?

Phases measured for the headline program family (586-entry DB, 8-SSE
query, r=128, batched K=384 path):
  1. session construction (DB pack + upload + one-op warm kernel)
  2. trace+lower of the per-query jit fn  (pure host work)
  3. compile (disk-cache hit or remote compile)
  4. first execution (device)
  5. serialize_executable round-trip: bytes size, deserialize time,
     run-from-deserialized time (in-process; cross-process load is the
     use case, but a failed in-process round-trip rules it out early)

Usage: python scripts/aot_experiment.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def main():
    t_import0 = time.perf_counter()
    import jax

    from cuda_satabsearch_tpu.io.pack import pack_query
    from cuda_satabsearch_tpu.io.parser import parse_search_input
    from cuda_satabsearch_tpu.session import SearchSession, SessionConfig
    print(f"imports: {time.perf_counter() - t_import0:.2f} s",
          file=sys.stderr)

    with open(os.path.join(FIXTURES, "d1ubia_.input")) as fp:
        query = pack_query(parse_search_input(fp).queries[0])
    dbfile = os.path.join(FIXTURES, "tableauxdistmatrixdb.small.ascii")

    t0 = time.perf_counter()
    sess = SearchSession(dbfile, SessionConfig(maxstart=128,
                                               backend="pallas"))
    print(f"session construction: {time.perf_counter() - t0:.2f} s "
          f"(load {sess.load_ms:.0f} ms, upload {sess.upload_ms:.0f} ms,"
          f" service warm-up {sess.warmup_s:.1f} s)", file=sys.stderr)

    # build the same jit fn the session's search path uses, but drive
    # lower/compile explicitly to split trace from compile
    from cuda_satabsearch_tpu.core.constants import DEFAULTS
    from cuda_satabsearch_tpu.ops.common import round8
    from cuda_satabsearch_tpu.ops.pallas_search import _make_db_fn2
    from cuda_satabsearch_tpu.ops.search import choose_chains

    n1r = round8(query.order)
    c_par, r_seq = choose_chains(128, 128)
    shapes = []
    chunk_args = []
    for bi, b in enumerate(sess.db.buckets):
        darr = sess.device_db[bi]["pallas"]
        for ch in darr["chunks"]:
            shapes.append((ch["size"], b.dim))
            chunk_args.append((ch["indices"], ch["n2"], ch["types2"],
                               ch["tab2p"], ch["dmat2"]))

    t0 = time.perf_counter()
    fn = _make_db_fn2(tuple(shapes), n1r, c_par, r_seq, True, DEFAULTS,
                      False, "pltpu", True, None)
    t_build = time.perf_counter() - t0

    from cuda_satabsearch_tpu.ops.common import prepare_query
    import jax.numpy as jnp
    qtypes, _q, qtabp, qdmat = prepare_query(query, n1r)
    args = (1234, 0, query.order, jnp.asarray(qtypes),
            jnp.asarray(qtabp), jnp.asarray(qdmat), chunk_args)

    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*args)
    jax.tree.map(np.asarray, out)
    t_first = time.perf_counter() - t0
    print(f"fn build {t_build:.2f} s | trace+lower {t_trace:.2f} s | "
          f"compile {t_compile:.2f} s | first exec+drain "
          f"{t_first:.2f} s", file=sys.stderr)

    # AOT: serialize the compiled executable and reload it
    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize)
        t0 = time.perf_counter()
        payload, in_tree, out_tree = serialize(compiled)
        t_ser = time.perf_counter() - t0
        t0 = time.perf_counter()
        reloaded = deserialize_and_load(payload, in_tree, out_tree)
        t_deser = time.perf_counter() - t0
        t0 = time.perf_counter()
        out2 = reloaded(*args)
        jax.tree.map(np.asarray, out2)
        t_run2 = time.perf_counter() - t0
        print(f"AOT serialize {t_ser:.2f} s ({len(payload) / 1e6:.1f} "
              f"MB) | deserialize_and_load {t_deser:.2f} s | "
              f"exec-from-deserialized {t_run2:.2f} s", file=sys.stderr)
    except Exception as e:
        print(f"AOT serialize path FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", file=sys.stderr)


if __name__ == "__main__":
    main()
