"""Engine-vs-golden lockstep tests.

The vectorized engine and the scalar golden model consume uniforms from
the same fixed slot schedule, so a chain of the engine must reproduce
the golden chain *bitwise* given the same uniform block (up to rare
1-ULP differences in expf between libm and XLA, which we surface rather
than hide: the assertion is exact).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import random_entry
from cuda_satabsearch_tpu.core.codes import TYPE_PAD
from cuda_satabsearch_tpu.io.pack import (DMAT_PAD, pack_database, pack_query)
from cuda_satabsearch_tpu.ops import golden
from cuda_satabsearch_tpu.ops.engine import (log_acc_slots,
                                              make_entry_search)
from cuda_satabsearch_tpu.ops.search import (choose_chains, entry_keys,
                                             search_db)


def _pad_db_entry(q, cap):
    """Pad one packed entry to bucket cap like pack_database does."""
    n = q.order
    types = np.full((cap,), TYPE_PAD, np.int8)
    types[:n] = q.types
    tabhi = np.zeros((cap, cap), np.int8)
    tabhi[:n, :n] = q.tabhi
    tablo = np.zeros((cap, cap), np.int8)
    tablo[:n, :n] = q.tablo
    dmat = np.full((cap, cap), DMAT_PAD, np.float32)
    dmat[:n, :n] = q.dmat
    return types, tabhi, tablo, dmat


def _run_pair(n1, n2, cap, c_par, r_seq, lorder, seed, gather_mode="take"):
    rng = np.random.default_rng(seed)
    q = pack_query(random_entry(rng, n1, "q"))
    db = pack_query(random_entry(rng, n2, "d"))
    types2, tabhi2, tablo2, dmat2 = _pad_db_entry(db, cap)

    fn = make_entry_search(n1, cap, c_par, r_seq, lorder, gather_mode)
    key = jax.random.PRNGKey(seed)
    score, bestmap = jax.jit(fn)(
        jnp.asarray(q.types), jnp.asarray(q.tabhi), jnp.asarray(q.tablo),
        jnp.asarray(q.dmat), jnp.asarray(types2), jnp.asarray(tabhi2),
        jnp.asarray(tablo2), jnp.asarray(dmat2),
        jnp.int32(n2), key)
    score, bestmap = int(score), np.asarray(bestmap)

    # golden: per chain c, concatenate that chain's uniform column over
    # the r_seq restarts (the engine regenerates a block per restart)
    per_restart = golden.uniforms_per_restart(n1)
    blocks = [np.asarray(log_acc_slots(jax.random.uniform(
        jax.random.fold_in(key, r), (per_restart, c_par),
        dtype=jnp.float32), n1))
        for r in range(r_seq)]
    chain_scores = np.empty(c_par, np.int64)
    chain_maps = np.empty((c_par, n1), np.int64)
    for c in range(c_par):
        u = np.concatenate([b[:, c] for b in blocks])
        res = golden.sa_chain(q, db, lorder=lorder, nrestarts=r_seq,
                              uniforms=u)
        chain_scores[c] = res.maxscore
        chain_maps[c] = res.bestmap
    gscore = chain_scores.max()
    winner = int(chain_scores.argmax())
    return score, bestmap, int(gscore), chain_maps[winner], chain_scores


@pytest.mark.parametrize("n1,n2,cap,lorder", [
    (6, 8, 16, True),
    (6, 8, 16, False),
    (8, 8, 16, True),
    (4, 12, 16, True),
    (12, 5, 16, True),
    (9, 15, 16, True),
])
def test_engine_matches_golden(n1, n2, cap, lorder):
    score, bestmap, gscore, gmap, _ = _run_pair(
        n1, n2, cap, c_par=8, r_seq=2, lorder=lorder, seed=n1 * 100 + n2)
    assert score == gscore
    np.testing.assert_array_equal(bestmap, gmap)


def test_engine_matches_golden_onehot():
    s1, m1, gs, gm, _ = _run_pair(6, 9, 16, 4, 2, True, 77,
                                  gather_mode="onehot")
    assert s1 == gs
    np.testing.assert_array_equal(m1, gm)


def test_engine_larger_bucket_padding_invariant():
    """Same entry packed at cap 16 vs cap 32 gives identical results."""
    out16 = _run_pair(6, 10, 16, 8, 1, True, 5)
    out32 = _run_pair(6, 10, 32, 8, 1, True, 5)
    assert out16[0] == out32[0]
    np.testing.assert_array_equal(out16[1], out32[1])


def test_choose_chains():
    assert choose_chains(128) == (128, 1)
    assert choose_chains(4096) == (128, 32)
    assert choose_chains(100) == (100, 1)
    assert choose_chains(1) == (1, 1)
    assert choose_chains(384, c_max=128) == (128, 3)


def test_search_db_end_to_end():
    """Full search over a tiny synthetic packed DB, vs golden per entry."""
    rng = np.random.default_rng(123)
    entries = [random_entry(rng, int(rng.integers(3, 14)), f"s{i:04d}")
               for i in range(17)]
    db = pack_database(entries)
    q = pack_query(random_entry(rng, 7, "query"))
    maxstart = 8
    res = search_db(q, db, maxstart=maxstart, lorder=True, seed=99,
                    query_tag=0)
    assert res.scores.shape == (17,)

    c_par, r_seq = choose_chains(maxstart)
    per_restart = golden.uniforms_per_restart(7)
    keys = np.asarray(entry_keys(99, 0, np.arange(len(entries))))
    for pos, e in enumerate(entries):
        dbq = pack_query(e)
        key = jnp.asarray(keys[pos])
        blocks = [np.asarray(log_acc_slots(jax.random.uniform(
            jax.random.fold_in(key, r), (per_restart, c_par)), 7))
            for r in range(r_seq)]
        best = None
        for c in range(c_par):
            u = np.concatenate([b[:, c] for b in blocks])
            g = golden.sa_chain(q, dbq, lorder=True, nrestarts=r_seq,
                                uniforms=u)
            best = g.maxscore if best is None else max(best, g.maxscore)
        assert res.scores[pos] == best, (pos, e.name)
