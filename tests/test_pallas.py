"""Pallas kernel vs engine vs golden: bitwise lockstep parity.

The kernel consumes uniform streams with the same n1r slot schedule as
the golden model and the engine, so on the same backend all three must
produce identical scores and best maps.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cuda_satabsearch_tpu.io.pack import pack_query  # noqa: E402
from cuda_satabsearch_tpu.ops import golden  # noqa: E402
from cuda_satabsearch_tpu.ops.common import (  # noqa: E402
    make_uniforms, pack_tab, prepare_query, round8)
from cuda_satabsearch_tpu.ops.engine import make_bucket_search  # noqa: E402
from cuda_satabsearch_tpu.ops.search import entry_keys  # noqa: E402

from conftest import random_entry  # noqa: E402


def _bucket_arrays(entries, d2):
    from cuda_satabsearch_tpu.core.codes import TYPE_PAD
    from cuda_satabsearch_tpu.io.pack import DMAT_PAD

    E = len(entries)
    types = np.full((E, d2), TYPE_PAD, np.int8)
    tabhi = np.zeros((E, d2, d2), np.int8)
    tablo = np.zeros((E, d2, d2), np.int8)
    dmat = np.full((E, d2, d2), DMAT_PAD, np.float32)
    orders = np.zeros((E,), np.int32)
    for i, e in enumerate(entries):
        o = e.order
        types[i, :o] = e.types
        tabhi[i, :o, :o] = e.tabhi
        tablo[i, :o, :o] = e.tablo
        dmat[i, :o, :o] = e.dmat
        orders[i] = o
    return types, tabhi, tablo, dmat, orders


def _run_engine(query, entries, d2, c_par, r_seq, lorder, keys):
    types, tabhi, tablo, dmat, orders = _bucket_arrays(entries, d2)
    fn = make_bucket_search(query.order, d2, c_par, r_seq, lorder, "take")
    s, m = fn(jnp.asarray(query.types), jnp.asarray(query.tabhi),
              jnp.asarray(query.tablo), jnp.asarray(query.dmat),
              jnp.asarray(types), jnp.asarray(tabhi), jnp.asarray(tablo),
              jnp.asarray(dmat), jnp.asarray(orders), keys)
    return np.asarray(s), np.asarray(m)


def test_kernel_matches_golden_chain():
    """v2 kernel chains vs the scalar golden model, chain by chain
    (supplied streams, interpret mode, single entry so chain maps are
    unambiguous)."""
    rng = np.random.default_rng(3)
    entries = [random_entry(rng, 11, "db0")]
    query = pack_query(random_entry(rng, 6, "q"))
    c_par, r_seq = 128, 2
    n1 = query.order
    P = golden.uniforms_per_restart(n1)
    seed, tag = 1234, 5

    (ks, kb), _db = _run_db_v2(query, entries, c_par, r_seq, True,
                               seed=seed, tag=tag)
    keys = entry_keys(seed, tag, np.arange(1))
    u = np.asarray(make_uniforms(keys, r_seq, P, c_par))[0]  # [r, P, C]

    allmax = -99999
    for c in range(128):
        flat = np.concatenate([u[r, :, c] for r in range(r_seq)])
        res = golden.sa_chain(query, entries[0], True, r_seq, flat)
        allmax = max(allmax, res.maxscore)
    assert ks[0] == allmax


def test_kernel_cpar_masking():
    """Chains >= c_par must not contribute to the result."""
    rng = np.random.default_rng(11)
    entries = [random_entry(rng, 10, "db0")]
    query = pack_query(random_entry(rng, 5, "q"))
    seed, tag = 7, 0

    (s8, _), _db = _run_db_v2(query, entries, 8, 1, True,
                              seed=seed, tag=tag)
    keys = entry_keys(seed, tag, np.arange(1))
    P = golden.uniforms_per_restart(query.order)
    un = np.asarray(make_uniforms(keys, 1, P, 8))[0]
    allmax = -99999
    for c in range(8):
        res = golden.sa_chain(query, entries[0], True, 1, un[0, :, c])
        allmax = max(allmax, res.maxscore)
    assert s8[0] == allmax


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="pltpu PRNG has no CPU interpret lowering")
def test_kernel_pltpu_rng_mode():
    """In-kernel PRNG mode: deterministic, plausible scores (stream
    differs from golden by design, like the reference's CPU vs GPU)."""
    from cuda_satabsearch_tpu.ops.pallas_sa2 import (
        make_pallas2_bucket_search, make_qb2)

    rng = np.random.default_rng(21)
    entries = [random_entry(rng, n, f"e{n}") for n in (6, 10, 15)]
    query = pack_query(random_entry(rng, 7, "q"))
    d2, c_par, r_seq = 16, 32, 2
    E, n1 = len(entries), query.order
    n1r = round8(n1)
    types, tabhi, tablo, dmat, orders = _bucket_arrays(entries, d2)
    qtypes, _qtv, qtabp, qdmat = prepare_query(query, n1r)
    tab2p = np.stack([pack_tab(tabhi[i], tablo[i]) for i in range(E)])
    fn, G = make_pallas2_bucket_search(E, n1, d2, c_par, r_seq, True,
                                       interpret=False, rng_mode="pltpu",
                                       lsoln=True)
    qb2t, qb2d = make_qb2(qtabp, qdmat, G)
    packed = np.concatenate([[1234, 0], np.arange(E)]).astype(np.int32)
    args = (jnp.asarray(orders), jnp.asarray(qtypes), qb2t, qb2d,
            jnp.asarray(types.astype(np.int32).reshape(E * d2, 1)),
            jnp.asarray(tab2p.reshape(E * d2, d2)),
            jnp.asarray(dmat.reshape(E * d2, d2)), jnp.asarray(packed))
    s1, m1 = fn(*args)
    s2, m2 = fn(*args)
    s1 = np.asarray(s1)[0, :, 0]
    np.testing.assert_array_equal(s1, np.asarray(s2)[0, :, 0])
    # compare against engine scores on the same problem: same magnitude
    es, _ = _run_engine(query, entries, d2, c_par, r_seq, True,
                        entry_keys(1234, 0, np.arange(E)))
    assert np.all(s1 >= -1)
    assert np.all(np.abs(s1 - es) <= np.maximum(4, 0.8 * np.abs(es) + 4))


def _run_db_v2(query, entries, c_par, r_seq, lorder, seed=1234, tag=0,
               buckets=(16, 112)):
    from cuda_satabsearch_tpu.io.pack import pack_database
    from cuda_satabsearch_tpu.ops.pallas_search import (
        assemble_db_pallas2, dispatch_db_pallas2)
    from cuda_satabsearch_tpu.core.constants import SAParams

    db = pack_database(entries, buckets=buckets)
    h = dispatch_db_pallas2(query, db, maxstart=c_par * r_seq,
                            lorder=lorder, seed=seed, query_tag=tag,
                            c_max=c_par, interpret=True,
                            rng_mode="supplied")
    return assemble_db_pallas2(h), db


@pytest.mark.parametrize("lorder", [True, False])
def test_kernel_v2_matches_engine(lorder):
    """Grouped (G=8) kernel vs engine: bitwise on shared streams."""
    rng = np.random.default_rng(17)
    entries = [random_entry(rng, int(n), f"e{i}")
               for i, n in enumerate(rng.integers(4, 17, size=11))]
    query = pack_query(random_entry(rng, 7, "q"))
    c_par, r_seq = 16, 2

    (ks, kb), db = _run_db_v2(query, entries, c_par, r_seq, lorder)
    es, eb = _run_engine(query, entries, 16, c_par, r_seq, lorder,
                         entry_keys(1234, 0, np.arange(len(entries))))
    # engine result is per-bucket order; map back via bucket index
    b = db.buckets[0]
    np.testing.assert_array_equal(ks[b.index[b.index >= 0]],
                                  es[: (b.index >= 0).sum()])
    np.testing.assert_array_equal(ks, es)  # single bucket, same order
    np.testing.assert_array_equal(kb, eb)


def test_kernel_v2_multi_bucket():
    """Entries spanning several caps (different G per bucket)."""
    rng = np.random.default_rng(23)
    sizes = [5, 9, 14, 18, 25, 31, 40, 60, 100]
    entries = [random_entry(rng, n, f"e{i}") for i, n in enumerate(sizes)]
    query = pack_query(random_entry(rng, 10, "q"))

    (ks, kb), db = _run_db_v2(query, entries, 8, 1, True,
                              buckets=(16, 32, 64, 112))
    # engine reference, bucket by bucket
    from cuda_satabsearch_tpu.io.pack import pack_database

    es = np.zeros_like(ks)
    eb = np.full_like(kb, -1)
    for b in db.buckets:
        sub = [entries[i] for i in b.index if i >= 0]
        s, m = _run_engine(query, sub, b.dim, 8, 1, True,
                           entry_keys(1234, 0, b.index[b.index >= 0]))
        es[b.index[b.index >= 0]] = s
        eb[b.index[b.index >= 0]] = m
    np.testing.assert_array_equal(ks, es)
    np.testing.assert_array_equal(kb, eb)


def test_kernel_v2_query_batched():
    """nq > 1 query grid axis == sequential single calls, bitwise
    (supplied streams, interpret)."""
    from cuda_satabsearch_tpu.ops.pallas_sa2 import (
        make_pallas2_bucket_search, make_qb2, make_qflat)

    rng = np.random.default_rng(31)
    entries = [random_entry(rng, int(n), f"e{i}")
               for i, n in enumerate(rng.integers(4, 16, size=8))]
    queries = [pack_query(random_entry(rng, 7, f"q{i}")) for i in range(3)]
    d2, c_par, r_seq, n1 = 16, 16, 1, 7
    E = len(entries)
    n1r = round8(n1)
    P = golden.uniforms_per_restart(n1)
    types, tabhi, tablo, dmat, orders = _bucket_arrays(entries, d2)
    tab2p = np.stack([pack_tab(tabhi[i], tablo[i]) for i in range(E)])

    single, G1 = make_pallas2_bucket_search(
        E, n1, d2, c_par, r_seq, True, interpret=True,
        rng_mode="supplied", lsoln=True)
    batched, G3 = make_pallas2_bucket_search(
        E, n1, d2, c_par, r_seq, True, interpret=True,
        rng_mode="supplied", lsoln=True, nq=3)
    assert G1 == G3
    G = G1
    EG = E // G
    PG = P * G

    t2flat = jnp.asarray(types.astype(np.int32).reshape(E * d2, 1))
    tpflat = jnp.asarray(tab2p.reshape(E * d2, d2))
    dmflat = jnp.asarray(dmat.reshape(E * d2, d2))
    urng = np.random.default_rng(5)

    qargs, unis, singles = [], [], []
    for q in queries:
        qtypes, _qtv, qtabp, qdmat = prepare_query(q, n1r)
        # follow whatever query-rep the production default picked
        # (dg -> lane-fused qflat vectors, else the qb2 MXU scatter)
        if single.qrep == "qflat":
            qb2t, qb2d = make_qflat(qtabp, qdmat)
        else:
            qb2t, qb2d = make_qb2(qtabp, qdmat, G)
        uni = jnp.asarray(
            urng.random((EG, r_seq, PG, 128)).astype(np.float32))
        s, m = single(jnp.asarray(orders), jnp.asarray(qtypes),
                      qb2t, qb2d, t2flat, tpflat, dmflat, uni)
        qargs.append((jnp.asarray(qtypes), qb2t, qb2d))
        unis.append(uni)
        singles.append((np.asarray(s), np.asarray(m)))

    qts = jnp.stack([a[0] for a in qargs])
    qb2ts = jnp.stack([a[1] for a in qargs])
    qb2ds = jnp.stack([a[2] for a in qargs])
    sb, mb = batched(jnp.asarray(orders), qts, qb2ts, qb2ds,
                     t2flat, tpflat, dmflat, jnp.stack(unis),
                     jnp.zeros((3,), jnp.int32))
    sb, mb = np.asarray(sb), np.asarray(mb)
    for qi, (s, m) in enumerate(singles):
        np.testing.assert_array_equal(sb[qi], s)
        np.testing.assert_array_equal(mb[qi], m)


def test_db_multi_batched_matches_single():
    """dispatch_db_pallas2_multi (query-batched kernels) == per-query
    dispatch_db_pallas2, bitwise, file order (supplied streams,
    interpret)."""
    from cuda_satabsearch_tpu.io.pack import pack_database
    from cuda_satabsearch_tpu.ops.pallas_search import (
        assemble_db_pallas2, assemble_db_pallas2_multi,
        dispatch_db_pallas2, dispatch_db_pallas2_multi)

    rng = np.random.default_rng(41)
    entries = [random_entry(rng, int(n), f"e{i}")
               for i, n in enumerate(rng.integers(4, 30, size=13))]
    queries = [pack_query(random_entry(rng, 6, f"q{i}")) for i in range(3)]
    db = pack_database(entries, buckets=(16, 32, 112))
    kw = dict(maxstart=16, lorder=True, seed=9, c_max=16,
              interpret=True, rng_mode="supplied", lsoln=True)

    multi = assemble_db_pallas2_multi(dispatch_db_pallas2_multi(
        queries, db, query_tags=[5, 6, 7], **kw))
    for qi, q in enumerate(queries):
        s1, m1 = assemble_db_pallas2(dispatch_db_pallas2(
            q, db, query_tag=5 + qi, **kw))
        np.testing.assert_array_equal(multi[qi][0], s1)
        np.testing.assert_array_equal(multi[qi][1], m1)


def test_db_multi_batched_mixed_orders():
    """Mixed exact orders within one round8 bucket batch into ONE
    kernel set and match per-query dispatch bitwise (the n1r slot
    schedule contract)."""
    from cuda_satabsearch_tpu.io.pack import pack_database
    from cuda_satabsearch_tpu.ops.pallas_search import (
        assemble_db_pallas2, assemble_db_pallas2_multi,
        dispatch_db_pallas2, dispatch_db_pallas2_multi)

    rng = np.random.default_rng(43)
    entries = [random_entry(rng, int(n), f"e{i}")
               for i, n in enumerate(rng.integers(4, 30, size=13))]
    # orders 4..8 all round8 to 8 — one batch group
    queries = [pack_query(random_entry(rng, n, f"q{n}"))
               for n in (4, 6, 7, 8, 5)]
    db = pack_database(entries, buckets=(16, 32, 112))
    kw = dict(maxstart=16, lorder=True, seed=9, c_max=16,
              interpret=True, rng_mode="supplied", lsoln=True)

    multi = assemble_db_pallas2_multi(dispatch_db_pallas2_multi(
        queries, db, query_tags=[5, 6, 7, 8, 9], **kw))
    for qi, q in enumerate(queries):
        s1, m1 = assemble_db_pallas2(dispatch_db_pallas2(
            q, db, query_tag=5 + qi, **kw))
        np.testing.assert_array_equal(multi[qi][0], s1)
        np.testing.assert_array_equal(multi[qi][1], m1)
        assert multi[qi][1].shape[1] == q.order


def test_kernel_blocked_fetch_bitwise():
    """The unified blocked fetch ('bd<k>': k entries per MXU block)
    is bitwise identical to the bd (k=G) and gdot (k=1) endpoints
    (supplied streams, interpret)."""
    from cuda_satabsearch_tpu.ops.pallas_sa2 import (
        make_pallas2_bucket_search, make_qb2)

    rng = np.random.default_rng(31)
    d2, c_par, r_seq, E = 16, 16, 2, 8
    entries = [random_entry(rng, rng.integers(6, d2 + 1), f"e{i}")
               for i in range(E)]
    query = pack_query(random_entry(rng, 7, "q"))
    n1 = query.order
    n1r = round8(n1)
    types, tabhi, tablo, dmat, orders = _bucket_arrays(entries, d2)
    qtypes, _qtv, qtabp, qdmat = prepare_query(query, n1r)
    tab2p = np.stack([pack_tab(tabhi[i], tablo[i]) for i in range(E)])
    P = golden.uniforms_per_restart(n1)
    keys = entry_keys(9, 3, np.arange(E))
    uni = np.asarray(make_uniforms(keys, r_seq, P, c_par))

    outs = []
    for fetch in ("bd", "bd4", "bd2", "gdot"):
        fn, G = make_pallas2_bucket_search(
            E, n1, d2, c_par, r_seq, True, interpret=True,
            rng_mode="supplied", lsoln=True, fetch=fetch, group=8)
        qb2t, qb2d = make_qb2(qtabp, qdmat, G)
        u = (uni.reshape(E // G, G, r_seq, P, 128)
             .transpose(0, 2, 3, 1, 4).reshape(E // G, r_seq, P * G, 128))
        s, m = fn(jnp.asarray(orders), jnp.asarray(qtypes), qb2t,
                  qb2d,
                  jnp.asarray(types.astype(np.int32).reshape(E * d2, 1)),
                  jnp.asarray(tab2p.reshape(E * d2, d2)),
                  jnp.asarray(dmat.reshape(E * d2, d2)),
                  jnp.asarray(u))
        outs.append((fetch, np.asarray(s), np.asarray(m)))
    for fetch, s, m in outs[1:]:
        np.testing.assert_array_equal(outs[0][1], s, err_msg=fetch)
        np.testing.assert_array_equal(outs[0][2], m, err_msg=fetch)


def test_tile_plan_exact_and_waste_logged(capsys):
    """_tile_plan's power-of-two descent covers any K exactly (no
    padded slots); _log_tile_waste stays silent then, and reports
    loudly if a plan ever over-allocates (no silent caps)."""
    from cuda_satabsearch_tpu.ops.pallas_search import (K_TILE,
                                                        _log_tile_waste,
                                                        _tile_plan)

    for k in range(1, 4 * K_TILE + 3):
        tiles = _tile_plan(k)
        assert sum(tiles) == k, (k, tiles)
        assert all(t == K_TILE or (t & (t - 1)) == 0 for t in tiles)
        assert _log_tile_waste(k, tiles) == 0
    assert capsys.readouterr().err == ""

    # a hypothetical padding plan is logged to stderr, never silent
    assert _log_tile_waste(3, [4]) == 1
    assert "1 padded slot" in capsys.readouterr().err


def test_kernel_dg_fetch_bitwise():
    """"dg" (per-lane dynamic-gather fetch) == the MXU one-hot fetch,
    bitwise on shared supplied streams, across widths and lorder."""
    from cuda_satabsearch_tpu.ops.pallas_sa2 import (
        make_pallas2_bucket_search, make_qb2, make_qflat)

    rng = np.random.default_rng(77)
    n1, c_par, r_seq, E = 7, 16, 2, 4
    n1r = round8(n1)
    P = golden.uniforms_per_restart(n1)
    for d2 in (16, 48, 112):
        entries = [random_entry(rng, int(n), f"e{i}") for i, n in
                   enumerate(rng.integers(max(4, d2 - 8), d2 + 1,
                                          size=E))]
        for e in entries:  # bf16-grid distances (pack-time contract)
            e.dmat[...] = np.asarray(
                jnp.asarray(e.dmat).astype(jnp.bfloat16), np.float32)
        query = pack_query(random_entry(rng, n1, "q"))
        types, tabhi, tablo, dmat, orders = _bucket_arrays(entries, d2)
        tab2p = np.stack([pack_tab(tabhi[i], tablo[i])
                          for i in range(E)])
        qtypes, _qtv, qtabp, qdmat = prepare_query(query, n1r)
        G = 2
        uni = jnp.asarray(np.random.default_rng(5).random(
            (E // G, r_seq, P * G, 128)).astype(np.float32))
        t2flat = jnp.asarray(types.astype(np.int32).reshape(E * d2, 1))
        tpflat = jnp.asarray(tab2p.reshape(E * d2, d2))
        dmflat = jnp.asarray(dmat.reshape(E * d2, d2))
        outs = {}
        for lorder in (True, False):
            for fetch in ("gdot", "dg", "dgs", "dgp"):
                fn, Gk = make_pallas2_bucket_search(
                    E, n1, d2, c_par, r_seq, lorder, interpret=True,
                    rng_mode="supplied", lsoln=True, fetch=fetch,
                    group=G)
                assert Gk == G
                assert fn.qrep == ("qb2" if fetch == "gdot" else "qflat")
                if fn.qrep == "qflat":
                    qa, qb = make_qflat(qtabp, qdmat)
                else:
                    qa, qb = make_qb2(qtabp, qdmat, G)
                s, m = fn(jnp.asarray(orders), jnp.asarray(qtypes),
                          qa, qb, t2flat, tpflat, dmflat, uni)
                outs[(lorder, fetch)] = (np.asarray(s), np.asarray(m))
            s_ref, m_ref = outs[(lorder, "gdot")]
            for v in ("dg", "dgs", "dgp"):
                s_dg, m_dg = outs[(lorder, v)]
                np.testing.assert_array_equal(s_dg, s_ref,
                                              err_msg=f"{d2}:{v}")
                np.testing.assert_array_equal(m_dg, m_ref,
                                              err_msg=f"{d2}:{v}")


def test_kernel_dg_fetch_bitwise_two_planes():
    """"dg" with a two-plane query fetch (n1r == 16) == the MXU
    one-hot fetch, bitwise (the fused index spans 256 lanes: 2 gathers
    + a plane select)."""
    from cuda_satabsearch_tpu.ops.pallas_sa2 import (
        dg_planes, make_pallas2_bucket_search, make_qb2, make_qflat)

    rng = np.random.default_rng(78)
    n1, c_par, r_seq, E = 13, 16, 2, 4
    n1r = round8(n1)
    assert dg_planes(n1r) == 2
    P = golden.uniforms_per_restart(n1)
    for d2 in (16, 64):
        entries = [random_entry(rng, int(n), f"e{i}") for i, n in
                   enumerate(rng.integers(max(4, d2 - 8), d2 + 1,
                                          size=E))]
        for e in entries:
            e.dmat[...] = np.asarray(
                jnp.asarray(e.dmat).astype(jnp.bfloat16), np.float32)
        query = pack_query(random_entry(rng, n1, "q"))
        types, tabhi, tablo, dmat, orders = _bucket_arrays(entries, d2)
        tab2p = np.stack([pack_tab(tabhi[i], tablo[i])
                          for i in range(E)])
        qtypes, _qtv, qtabp, qdmat = prepare_query(query, n1r)
        G = 2
        uni = jnp.asarray(np.random.default_rng(6).random(
            (E // G, r_seq, P * G, 128)).astype(np.float32))
        t2flat = jnp.asarray(types.astype(np.int32).reshape(E * d2, 1))
        tpflat = jnp.asarray(tab2p.reshape(E * d2, d2))
        dmflat = jnp.asarray(dmat.reshape(E * d2, d2))
        outs = {}
        for fetch in ("gdot", "dg", "dgp"):
            fn, Gk = make_pallas2_bucket_search(
                E, n1, d2, c_par, r_seq, True, interpret=True,
                rng_mode="supplied", lsoln=True, fetch=fetch, group=G)
            qa, qb = (make_qflat(qtabp, qdmat) if fn.qrep == "qflat"
                      else make_qb2(qtabp, qdmat, G))
            s, m = fn(jnp.asarray(orders), jnp.asarray(qtypes),
                      qa, qb, t2flat, tpflat, dmflat, uni)
            outs[fetch] = (np.asarray(s), np.asarray(m))
        for v in ("dg", "dgp"):
            np.testing.assert_array_equal(
                outs[v][0], outs["gdot"][0], err_msg=f"{d2}:{v}")
            np.testing.assert_array_equal(
                outs[v][1], outs["gdot"][1], err_msg=f"{d2}:{v}")


def test_kernel_dgp_fetch_bitwise_five_planes():
    """"dgp" with a five-plane query fetch (n1r == 24, e.g. the 19-SSE
    d2phlb1 query) == the MXU one-hot fetch, bitwise — guards the
    round-5 adoption of the packed gather beyond two planes."""
    from cuda_satabsearch_tpu.ops.pallas_sa2 import (
        dg_planes, make_pallas2_bucket_search, make_qb2, make_qflat)

    rng = np.random.default_rng(81)
    n1, c_par, r_seq, E = 19, 16, 2, 4
    n1r = round8(n1)
    assert dg_planes(n1r) == 5
    P = golden.uniforms_per_restart(n1)
    for d2 in (24, 64):
        entries = [random_entry(rng, int(n), f"e{i}") for i, n in
                   enumerate(rng.integers(max(4, d2 - 8), d2 + 1,
                                          size=E))]
        for e in entries:
            e.dmat[...] = np.asarray(
                jnp.asarray(e.dmat).astype(jnp.bfloat16), np.float32)
        query = pack_query(random_entry(rng, n1, "q"))
        types, tabhi, tablo, dmat, orders = _bucket_arrays(entries, d2)
        tab2p = np.stack([pack_tab(tabhi[i], tablo[i])
                          for i in range(E)])
        qtypes, _qtv, qtabp, qdmat = prepare_query(query, n1r)
        G = 2
        uni = jnp.asarray(np.random.default_rng(8).random(
            (E // G, r_seq, P * G, 128)).astype(np.float32))
        t2flat = jnp.asarray(types.astype(np.int32).reshape(E * d2, 1))
        tpflat = jnp.asarray(tab2p.reshape(E * d2, d2))
        dmflat = jnp.asarray(dmat.reshape(E * d2, d2))
        outs = {}
        for fetch in ("gdot", "dgp"):
            fn, Gk = make_pallas2_bucket_search(
                E, n1, d2, c_par, r_seq, True, interpret=True,
                rng_mode="supplied", lsoln=True, fetch=fetch, group=G)
            qa, qb = (make_qflat(qtabp, qdmat) if fn.qrep == "qflat"
                      else make_qb2(qtabp, qdmat, G))
            s, m = fn(jnp.asarray(orders), jnp.asarray(qtypes),
                      qa, qb, t2flat, tpflat, dmflat, uni)
            outs[fetch] = (np.asarray(s), np.asarray(m))
        np.testing.assert_array_equal(outs["dgp"][0], outs["gdot"][0],
                                      err_msg=str(d2))
        np.testing.assert_array_equal(outs["dgp"][1], outs["gdot"][1],
                                      err_msg=str(d2))


def test_packed_drain_roundtrip_all_dtypes():
    """_pack_out/_unpack_out round-trip exactly for every score/map
    dtype combination the derivations can produce (int8/int16/int32
    scores, int8/int16 maps), including negative values."""
    from cuda_satabsearch_tpu.ops.pallas_search import (_pack_out,
                                                        _unpack_out)

    rng = np.random.default_rng(9)
    n, n1r = 37, 8
    for sdt, lim in ((jnp.int8, 127), (jnp.int16, 32767),
                     (jnp.int32, 2**31 - 1)):
        for mdt, mlim in ((jnp.int8, 127), (jnp.int16, 32767)):
            scores = jnp.asarray(
                rng.integers(-lim - 1, lim, size=n), sdt)
            maps = jnp.asarray(
                rng.integers(-1, mlim, size=(n, n1r)), mdt)
            packed = np.asarray(_pack_out(scores, maps))
            assert packed.dtype == np.int8
            sb = jnp.dtype(sdt).itemsize
            mb = jnp.dtype(mdt).itemsize
            assert packed.shape == (n, sb + mb * n1r)
            s, m = _unpack_out(packed, n1r, True, mb, sb)
            np.testing.assert_array_equal(s, np.asarray(scores))
            np.testing.assert_array_equal(m, np.asarray(maps))


def test_kernel_dg_single_entry_chunk():
    """dg with a 1-entry chunk (G clamps to 1; wide bucket) == engine,
    bitwise — the CLI's tiny-DB path (e.g. tableauxdistmatrixdb.test
    or the standalone probe entries)."""
    rng = np.random.default_rng(41)
    entries = [random_entry(rng, 100, "big0")]
    query = pack_query(random_entry(rng, 7, "q"))
    c_par, r_seq = 16, 2

    (ks, kb), _db = _run_db_v2(query, entries, c_par, r_seq, True,
                               buckets=(112,))
    es, eb = _run_engine(query, entries, 112, c_par, r_seq, True,
                         entry_keys(1234, 0, np.arange(1)))
    np.testing.assert_array_equal(ks, es)
    np.testing.assert_array_equal(kb, eb)


def test_tuned_tables_cover_default_buckets():
    """Every default bucket cap has an HW-swept kernel config, and the
    perf-critical dg adoption holds for lane-fusable queries — guards
    against silent config drift (a cap missing from TUNED_DG would
    quietly fall back to the slower MXU fetch)."""
    from cuda_satabsearch_tpu.io.pack import DEFAULT_BUCKETS
    from cuda_satabsearch_tpu.ops.pallas_sa2 import (TUNED_CONFIG,
                                                     TUNED_DG,
                                                     TUNED_DGP,
                                                     choose_fetch)

    for cap in DEFAULT_BUCKETS:
        assert cap in TUNED_DG, cap
        assert cap in TUNED_DGP, cap
        assert cap in TUNED_CONFIG, cap
        # round-5 adoption: the packed single-gather fetch for
        # lane-fusable queries at every default width
        assert choose_fetch(cap, None, 8) == "dgp", cap


def test_aot_cache_roundtrip(tmp_path, monkeypatch):
    """AotJit stores a serialized executable on first call and a fresh
    instance with the same key loads it from disk (the sub-second
    warm-process startup path); corrupt cache files fall back to a
    clean rebuild."""
    import cuda_satabsearch_tpu.core.aotcache as ac

    monkeypatch.setenv("SATAB_AOT_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("SATAB_NO_AOT_CACHE", raising=False)

    def f(x, y):
        return (x * 2 + y).sum()

    args = (jnp.arange(8, dtype=jnp.float32),
            jnp.ones((8,), jnp.float32))
    a = ac.AotJit(f, ("test_fn", 1))
    out1 = np.asarray(a(*args))
    files = list(tmp_path.glob("*.aot"))
    if not files:
        # backend cannot serialize executables — the wrapper must have
        # fallen back to plain jit and still computed correctly
        assert a._fallback or a._compiled is not None
        np.testing.assert_allclose(out1, 2 * np.arange(8).sum() + 8)
        return
    assert len(files) == 1

    b = ac.AotJit(f, ("test_fn", 1))
    out2 = np.asarray(b(*args))
    np.testing.assert_array_equal(out1, out2)
    assert b._compiled is not None and not b._fallback

    # different key -> second cache entry, not a false hit
    c = ac.AotJit(f, ("test_fn", 2))
    np.asarray(c(*args))
    assert len(list(tmp_path.glob("*.aot"))) == 2

    # corrupt entry: load fails, file is replaced, result still right
    files[0].write_bytes(b"garbage")
    d = ac.AotJit(f, ("test_fn", 1))
    out3 = np.asarray(d(*args))
    np.testing.assert_array_equal(out1, out3)


def test_kernel_unroll_bitwise():
    """unroll=2 (manual partial unroll of the annealing loop) is
    bitwise-identical to the rolled loop — the knob only trims loop
    control, never reorders the RNG slot schedule."""
    from cuda_satabsearch_tpu.ops.pallas_sa2 import (
        make_pallas2_bucket_search, make_qflat)

    rng = np.random.default_rng(83)
    n1, c_par, r_seq, E, d2 = 7, 16, 2, 4, 16
    n1r = round8(n1)
    P = golden.uniforms_per_restart(n1)
    entries = [random_entry(rng, int(n), f"e{i}") for i, n in
               enumerate(rng.integers(8, d2 + 1, size=E))]
    for e in entries:
        e.dmat[...] = np.asarray(
            jnp.asarray(e.dmat).astype(jnp.bfloat16), np.float32)
    query = pack_query(random_entry(rng, n1, "q"))
    types, tabhi, tablo, dmat, orders = _bucket_arrays(entries, d2)
    tab2p = np.stack([pack_tab(tabhi[i], tablo[i]) for i in range(E)])
    qtypes, _qtv, qtabp, qdmat = prepare_query(query, n1r)
    G = 2
    uni = jnp.asarray(np.random.default_rng(9).random(
        (E // G, r_seq, P * G, 128)).astype(np.float32))
    t2flat = jnp.asarray(types.astype(np.int32).reshape(E * d2, 1))
    tpflat = jnp.asarray(tab2p.reshape(E * d2, d2))
    dmflat = jnp.asarray(dmat.reshape(E * d2, d2))
    outs = {}
    for unroll in (1, 2):
        fn, _G = make_pallas2_bucket_search(
            E, n1, d2, c_par, r_seq, True, interpret=True,
            rng_mode="supplied", lsoln=True, fetch="dgp", group=G,
            unroll=unroll)
        qa, qb = make_qflat(qtabp, qdmat)
        s, m = fn(jnp.asarray(orders), jnp.asarray(qtypes), qa,
                  qb, t2flat, tpflat, dmflat, uni)
        outs[unroll] = (np.asarray(s), np.asarray(m))
    np.testing.assert_array_equal(outs[2][0], outs[1][0])
    np.testing.assert_array_equal(outs[2][1], outs[1][1])
