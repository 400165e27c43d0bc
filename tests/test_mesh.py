"""Mesh-sharded execution: bitwise parity with single-device search.

Runs on the virtual 8-device CPU mesh (conftest).  The entry-axis
sharding must not change any score: per-entry RNG keys derive from the
entry's file-order index, which is invariant to bucketing, padding, and
sharding.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from cuda_satabsearch_tpu.io.pack import pack_database, pack_query  # noqa: E402
from cuda_satabsearch_tpu.ops.search import search_db  # noqa: E402
from cuda_satabsearch_tpu.parallel.mesh import (entry_sharding,  # noqa: E402
                                                make_mesh)

from conftest import random_entry  # noqa: E402


def test_sharded_matches_unsharded():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    rng = np.random.default_rng(3)
    entries = [random_entry(rng, int(n), f"e{i:03d}")
               for i, n in enumerate(rng.integers(4, 30, size=21))]
    query = pack_query(random_entry(rng, 9, "q"))

    db_plain = pack_database(entries)
    res_plain = search_db(query, db_plain, maxstart=16, lorder=True,
                          seed=7, query_tag=3, backend="xla")

    mesh = make_mesh(jax.devices()[:8])
    db_pad = pack_database(entries, pad_to=mesh.size)
    res_shard = search_db(query, db_pad, maxstart=16, lorder=True,
                          seed=7, query_tag=3, backend="xla",
                          sharding=entry_sharding(mesh))

    np.testing.assert_array_equal(res_shard.scores, res_plain.scores)
    np.testing.assert_array_equal(res_shard.ssemaps, res_plain.ssemaps)


def test_mesh_padding_counts():
    rng = np.random.default_rng(5)
    entries = [random_entry(rng, 10, f"e{i}") for i in range(5)]
    db = pack_database(entries, pad_to=8)
    for b in db.buckets:
        assert b.size % 8 == 0
        assert (b.index >= 0).sum() == 5


def test_pallas_sharded_matches_unsharded_interpret():
    """The production (Pallas) kernel under shard_map over the 8-device
    CPU mesh (interpret mode) is bitwise equal to its unsharded run AND
    to the XLA engine on the same supplied threefry streams."""
    from cuda_satabsearch_tpu.ops.pallas_search import (
        assemble_db_pallas2, dispatch_db_pallas2)

    rng = np.random.default_rng(13)
    entries = [random_entry(rng, int(n), f"e{i:03d}")
               for i, n in enumerate(rng.integers(4, 17, size=19))]
    query = pack_query(random_entry(rng, 7, "q"))
    db = pack_database(entries, buckets=(16, 112))

    kw = dict(maxstart=16, lorder=True, seed=7, query_tag=3, c_max=16,
              rng_mode="supplied", interpret=True)
    s_plain, m_plain = assemble_db_pallas2(
        dispatch_db_pallas2(query, db, **kw))

    mesh = make_mesh(jax.devices()[:8])
    s_shard, m_shard = assemble_db_pallas2(
        dispatch_db_pallas2(query, db, mesh=mesh, **kw))

    np.testing.assert_array_equal(s_shard, s_plain)
    np.testing.assert_array_equal(m_shard, m_plain)

    ref = search_db(query, db, maxstart=16, lorder=True, seed=7,
                    query_tag=3, c_max=16, backend="xla")
    np.testing.assert_array_equal(s_shard, ref.scores)
    np.testing.assert_array_equal(m_shard, ref.ssemaps)


def test_pallas_batched_multiquery_sharded_bitwise():
    """The query-grid-axis batched kernel (_make_db_fnK) under
    shard_map over the 8-device CPU mesh == its unsharded run, bitwise
    (mixed exact orders, lsoln on) — the fastest kernel configuration
    and the multi-chip path are the SAME code since round 4."""
    from cuda_satabsearch_tpu.ops.pallas_search import (
        assemble_db_pallas2_multi, dispatch_db_pallas2_multi)

    rng = np.random.default_rng(23)
    entries = [random_entry(rng, int(n), f"e{i:03d}")
               for i, n in enumerate(rng.integers(4, 17, size=17))]
    queries = [pack_query(random_entry(rng, int(n), f"q{i}"))
               for i, n in enumerate((7, 5, 8))]
    db = pack_database(entries, buckets=(16, 112))

    kw = dict(maxstart=16, lorder=True, seed=7, query_tags=[4, 5, 6],
              c_max=16, rng_mode="supplied", interpret=True, lsoln=True)
    plain = assemble_db_pallas2_multi(
        dispatch_db_pallas2_multi(queries, db, **kw))

    mesh = make_mesh(jax.devices()[:8])
    shard = assemble_db_pallas2_multi(
        dispatch_db_pallas2_multi(queries, db, mesh=mesh, **kw))

    for qi, q in enumerate(queries):
        np.testing.assert_array_equal(shard[qi][0], plain[qi][0])
        np.testing.assert_array_equal(shard[qi][1], plain[qi][1])
        assert shard[qi][1].shape == (db.nentries, q.order)


def test_mesh_balance_report():
    """Chunk-split sharding balances work exactly; a naive contiguous
    entry split of a lognormal (ASTRAL-like) size mix does not."""
    from bench import synthetic_entries
    from cuda_satabsearch_tpu.ops.balance import (balance_report,
                                                  format_report)

    db = pack_database(synthetic_entries(2048), pad_to=8)
    rep = balance_report(db, 8)
    # per-shard work equal by construction: every device runs E/8 rows
    # of every padded chunk
    assert rep["imbalance"] < 1e-9
    assert len(set(rep["per_shard_ms"])) == 1
    assert len(set(rep["iters_m_per_shard"])) == 1
    # the naive contiguous split is measurably imbalanced on the
    # size-sorted lognormal mix (small entries first -> last shard
    # gets all the wide ones)
    assert rep["naive_imbalance"] > 0.10
    # padding overhead at 2048 entries is dominated by each bucket's
    # tail chunk rounding up to the 128-entry mesh quantum (8 dev x
    # MAX_GROUP); it stays bounded here and amortizes to a few percent
    # at the 14291-entry ASTRAL scale
    assert 0.0 < rep["padding_overhead"] < 1.0
    assert "imbalance 0.00%" in format_report(rep)


def test_mesh_balance_matches_real_chunks():
    """The balance accounting walks the SAME chunk layout the device
    preparation builds (chunk_layout is shared code), so per-shard
    iteration counts equal the sum over prepared chunk sizes / ndev."""
    from bench import synthetic_entries
    from cuda_satabsearch_tpu.ops.balance import balance_report
    from cuda_satabsearch_tpu.ops.pallas_search import (
        prepare_bucket_pallas2)

    db = pack_database(synthetic_entries(300), pad_to=8)
    mesh = make_mesh(jax.devices()[:8])
    total_padded = 0
    for b in db.buckets:
        prep = prepare_bucket_pallas2(b, mesh=mesh)
        total_padded += sum(c["size"] for c in prep["chunks"])
    rep = balance_report(db, 8, restarts=128)
    # iters_m_per_shard are millions of entry-iterations per device
    expect = total_padded / 8 * 128 * 100 / 1e6
    # report values are rounded to 3 decimals
    assert abs(rep["iters_m_per_shard"][0] - expect) < 1e-3


def test_chunk_layout_mesh_invariant_groups():
    """The pltpu sharded==unsharded bitwise guarantee rests on this
    construction: for every bucket size and mesh size, a device's
    local slice of the meshed chunk plan covers exactly the same
    global rows, with the same effective group size and the same
    group-leader rows, as the corresponding slice of the unsharded
    plan — so the G-keyed, leader-seeded pltpu streams coincide.
    (Round-5 fix: tails pad to the width's group CEILING
    (max_reachable_group), never to a smaller power of two, which used
    to change G for sub-group tails.)"""
    from cuda_satabsearch_tpu.ops.pallas_sa2 import effective_group
    from cuda_satabsearch_tpu.ops.pallas_search import (MAX_GROUP,
                                                        chunk_layout)

    from cuda_satabsearch_tpu.ops.pallas_sa2 import (
        max_reachable_group)

    for n in (1, 2, 5, 16, 40, 130, 400):
        for d2 in (8, 16, 24, 48, 64, 112):
            base = chunk_layout(n, 1, d2=d2)
            for n1 in (8, 13, 19):
                for s1, e1, E1 in base:
                    # unsharded E is always >= the width's group
                    # ceiling, so the effective G is the tuned value
                    assert E1 % max_reachable_group(d2) == 0 or E1 >= 16
            for ndev in (2, 4, 8):
                meshed = chunk_layout(n, ndev, d2=d2)
                for s2, e2, E2 in meshed:
                    assert E2 % (ndev * MAX_GROUP) == 0
                    local = E2 // ndev
                    assert local % MAX_GROUP == 0
                    for n1 in (8, 13, 19):
                        gl = effective_group(local, d2, n1)
                        # every unsharded chunk overlapping this span
                        # lands on the SAME effective G (E >= the
                        # group ceiling in both layouts)
                        for s1, e1, E1 in base:
                            if s1 >= e2 or e1 <= s2:
                                continue
                            assert effective_group(E1, d2, n1) == gl, (
                                n, ndev, d2, n1, E1, local)
                        # group leaders sit at multiples of gl in both
                        # layouts (slices start at MAX_GROUP multiples,
                        # which gl divides)
                        assert MAX_GROUP % gl == 0
