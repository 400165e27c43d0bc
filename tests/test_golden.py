"""Golden-model invariant tests.

The central invariant is the reference's own TESTING assert
(cudaSaTabsearch_kernel.cu:1105-1134): after any proposed move,
score + deltasd(...) must equal the full tmscord rescore of the moved
mapping.  We also pin down the LORDER window quirks with targeted cases.
"""

import numpy as np
import pytest

from conftest import random_entry
from cuda_satabsearch_tpu.ops import golden
from cuda_satabsearch_tpu.io.pack import pack_query


def _random_state(rng, q, db):
    """Build a random consistent partial one-to-one (monotone not required)."""
    n1, n2 = q.order, db.order
    ssemap = np.full(n1, -1, dtype=np.int64)
    revmap = np.full(n2, -1, dtype=np.int64)
    perm = rng.permutation(n2)
    k = 0
    for i in range(n1):
        if rng.random() < 0.6 and k < n2:
            ssemap[i] = perm[k]
            revmap[perm[k]] = i
            k += 1
    return ssemap, revmap


def test_delta_equals_full_rescore():
    rng = np.random.default_rng(42)
    for trial in range(200):
        n1 = int(rng.integers(2, 12))
        n2 = int(rng.integers(2, 14))
        q = pack_query(random_entry(rng, n1, "q"))
        db = pack_query(random_entry(rng, n2, "d"))
        ssemap, revmap = _random_state(rng, q, db)
        score = golden.tmscord(q.tabhi, q.tablo, q.dmat, n1,
                               db.tabhi, db.tablo, db.dmat, n2, ssemap)
        ssei = int(rng.integers(0, n1))
        oldj = ssemap[ssei]
        # any new_j: -1, or an unmatched SSE
        free = [j for j in range(n2) if revmap[j] < 0] + [-1]
        newj = free[int(rng.integers(0, len(free)))]
        delta = golden.deltasd(q.tabhi, q.tablo, q.dmat, n1,
                               db.tabhi, db.tablo, db.dmat, n2,
                               ssemap, ssei, oldj, newj)
        moved = ssemap.copy()
        moved[ssei] = newj
        full = golden.tmscord(q.tabhi, q.tablo, q.dmat, n1,
                              db.tabhi, db.tablo, db.dmat, n2, moved)
        assert score + delta == full, (trial, ssei, oldj, newj)


def test_lorder_window_quirks():
    n1, n2 = 5, 9
    # fully unmapped: no predecessor -> startj falls back to n2 (empty)
    ssemap = np.full(n1, -1, dtype=np.int64)
    startj, endj = golden.lorder_window(ssemap, 2, n1, n2)
    assert startj == n2
    assert endj == -1  # no mapped successor and ssei != n1-1 -> empty
    # ssei is last: endj = n2
    startj, endj = golden.lorder_window(ssemap, n1 - 1, n1, n2)
    assert (startj, endj) == (n2, n2)
    # own mapping is the window start (inclusive semantics)
    ssemap = np.array([1, 3, -1, 6, -1], dtype=np.int64)
    startj, endj = golden.lorder_window(ssemap, 1, n1, n2)
    assert (startj, endj) == (3, 6)  # own mapping, next mapped successor
    # unmapped ssei: nearest mapped predecessor
    startj, endj = golden.lorder_window(ssemap, 2, n1, n2)
    assert (startj, endj) == (3, 6)
    # mapped ssei with unmapped tail: successor scan finds nothing -> -1
    startj, endj = golden.lorder_window(ssemap, 3, n1, n2)
    assert (startj, endj) == (6, -1)


def test_randtypeind_semantics():
    types = np.array([0, 1, 0, 0, 1, 0], dtype=np.int64)
    smap = np.array([-1, -1, 2, -1, -1, -1], dtype=np.int64)
    # candidates of type 0, unmatched, in [0, 6): indices 0, 3, 5 (2 is matched)
    # u = 0.5 -> trunc((0.5 - eps) * 3) = 1 -> index 3
    assert golden.randtypeind(types, 6, 0, 0, smap, 6, 0.5) == 3
    # single candidate ignores u
    assert golden.randtypeind(types, 6, 0, 1, smap, 2, 0.99) == 1
    # empty window
    assert golden.randtypeind(types, 6, 4, 0, smap, 2, 0.1) == -1
    assert golden.randtypeind(types, 6, 6, 0, smap, -1, 0.1) == -1


def test_trunc_index_bounds():
    assert golden.trunc_index(np.float32(0.0), 8) == 0
    assert golden.trunc_index(np.float32(0.999999), 8) == 7
    assert golden.trunc_index(np.float32(1.0), 8) == 7  # EPS guard


def test_thinit_monotone_and_typed():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n1 = int(rng.integers(2, 10))
        n2 = int(rng.integers(2, 12))
        q = pack_query(random_entry(rng, n1))
        db = pack_query(random_entry(rng, n2))
        ssemap = np.full(n1, -1, dtype=np.int64)
        revmap = np.full(n2, -1, dtype=np.int64)
        u = rng.random(n1).astype(np.float32)
        golden.thinit(q.types, n1, db.types, n2, ssemap, revmap, u)
        mapped = [(i, j) for i, j in enumerate(ssemap) if j >= 0]
        # type-consistent and strictly increasing in j
        for i, j in mapped:
            assert q.types[i] == db.types[j]
            assert revmap[j] == i
        js = [j for _, j in mapped]
        assert js == sorted(js) and len(set(js)) == len(js)


def test_sa_chain_runs_and_scores_consistent():
    rng = np.random.default_rng(3)
    q = pack_query(random_entry(rng, 6))
    db = pack_query(random_entry(rng, 8))
    nrestarts = 4
    u = rng.random(nrestarts * golden.uniforms_per_restart(6)).astype(np.float32)
    res = golden.sa_chain(q, db, lorder=True, nrestarts=nrestarts, uniforms=u)
    # bestmap must achieve exactly maxscore
    best = golden.tmscord(q.tabhi, q.tablo, q.dmat, 6,
                          db.tabhi, db.tablo, db.dmat, 8, res.bestmap)
    assert best == res.maxscore
    # order maintained under lorder
    js = [j for j in res.bestmap if j >= 0]
    assert js == sorted(js)


def test_self_match_scores_high():
    """Matching a structure against itself should find the identity-ish
    mapping with a clearly positive score."""
    rng = np.random.default_rng(11)
    e = random_entry(rng, 8)
    q = pack_query(e)
    u = rng.random(32 * golden.uniforms_per_restart(8)).astype(np.float32)
    res = golden.sa_chain(q, q, lorder=True, nrestarts=32, uniforms=u)
    # identity mapping scores: every pair i<k with |d-d|=0<=4 counts tscord=2
    n = 8
    ident = golden.tmscord(q.tabhi, q.tablo, q.dmat, n,
                           q.tabhi, q.tablo, q.dmat, n, np.arange(n))
    assert ident == 2 * (n * (n - 1) // 2)
    assert res.maxscore >= 0.7 * ident
