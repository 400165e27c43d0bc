"""Reference probe fixtures: substructure + permutation robustness.

The reference's scale/permutation robustness methodology (SURVEY §4.5):
``1qlp_sheetbc.input`` is a 9-SSE sheet substructure query built from
d1qlpa_ (pytableaucreate.py -s), and ``ssepermutationremap.py`` /
``ssesubsetremap.py`` map solution SSE correspondences from
permuted/subset queries back to original SSE numbering.  These tests
turn both probes into executable properties against the golden model:

* the sheet-substructure query, searched against its source structure,
  recovers exactly the SSE subset it was cut from (and remap_subset
  maps the solution back to the identity correspondence);
* an SSE-permuted query scores identically (order-free mode) and
  remap_permutation returns a correspondence whose score on the
  ORIGINAL query equals the permuted run's reported score.
"""

import os

import numpy as np
import pytest

from cuda_satabsearch_tpu.io.pack import pack_query
from cuda_satabsearch_tpu.io.parser import (TableauEntry,
                                            parse_search_input,
                                            read_database)
from cuda_satabsearch_tpu.ops import golden
from cuda_satabsearch_tpu.tools.ssemap import (remap_permutation,
                                               remap_subset)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

# the SSE subset (0-based) of d1qlpa_ that 1qlp_sheetbc was built from,
# recovered by exhaustive monotone submatrix match of the probe's
# tableau + distance matrix inside the full entry (unique solution)
SHEETBC_SUBSET = [1, 11, 12, 13, 14, 17, 23, 24, 25]


def _load_probe():
    with open(os.path.join(FIXTURES, "1qlp_sheetbc.input")) as fh:
        sin = parse_search_input(fh)
    query = pack_query(sin.queries[0])
    dbent = read_database(os.path.join(FIXTURES, "d1qlpa_.ascii"))[0]
    return sin, query, dbent


def test_sheetbc_raw_subset_is_exact_submatrix():
    """The probe fixture really is the claimed subset of its source
    (raw parsed entries, before pack-time bf16 distance quantization)."""
    with open(os.path.join(FIXTURES, "1qlp_sheetbc.input")) as fh:
        raw = parse_search_input(fh).queries[0]
    dbent = read_database(os.path.join(FIXTURES, "d1qlpa_.ascii"))[0]
    sel = np.array(SHEETBC_SUBSET)
    assert raw.order == len(sel)
    assert np.array_equal(raw.types, dbent.types[sel])
    assert np.array_equal(raw.tabhi, dbent.tabhi[np.ix_(sel, sel)])
    assert np.array_equal(raw.tablo, dbent.tablo[np.ix_(sel, sel)])
    # distances recomputed by pytableaucreate for the subset match the
    # full entry's to the ASCII format's 0.1 A resolution
    off = ~np.eye(len(sel), dtype=bool)
    assert np.allclose(raw.dmat[off],
                       dbent.dmat[np.ix_(sel, sel)][off], atol=0.051)


def _uniforms(rng, n1, nrestarts, maxiter=100):
    """Golden slot schedule: uniform [0,1) everywhere, accept slots
    (base + n1r + 3*it + 2) in the log domain (engine.log_acc_slots)."""
    n1r = max(8, -(-n1 // 8) * 8)
    per = n1r + 3 * maxiter
    u = rng.random(nrestarts * per, dtype=np.float32)
    u = np.clip(u, 1e-30, None)
    for r in range(nrestarts):
        base = r * per
        acc = base + n1r + 3 * np.arange(maxiter) + 2
        u[acc] = np.log(u[acc])
    return u


def test_sheetbc_probe_recovers_source_subset():
    """Searching the sheet substructure against its source structure
    finds the exact subset embedding (perfect score), and remap_subset
    maps the solution back to the identity correspondence."""
    sin, query, dbent = _load_probe()
    assert sin.lorder and sin.lsoln  # the probe ships as 'T T T'
    db = pack_query(dbent)
    sel = np.array(SHEETBC_SUBSET)
    perfect = golden.tmscord(query.tabhi, query.tablo, query.dmat,
                             query.order, db.tabhi, db.tablo, db.dmat,
                             db.order, sel)
    # every aligned pair agrees exactly: 2 * C(9, 2)
    assert perfect == 2 * (9 * 8 // 2)

    rng = np.random.default_rng(1234)
    res = golden.sa_chain(query, db, lorder=True, nrestarts=128,
                          uniforms=_uniforms(rng, query.order, 128))
    assert res.maxscore == perfect
    assert np.array_equal(res.bestmap, sel)

    # ssesubsetremap.py property: solutions in query-subset numbering
    # map back to original numbering — here the identity pairs
    pairs = [(k + 1, int(res.bestmap[k]) + 1)
             for k in range(query.order) if res.bestmap[k] >= 0]
    remapped = remap_subset(pairs, [int(i) + 1 for i in sel])
    assert remapped == [(int(i) + 1, int(i) + 1) for i in sel]


def test_permuted_query_scores_identically():
    """ssepermutationremap.py property: an SSE-permuted query (the
    builder's -u mode) finds the same maximum in order-free mode, and
    the remapped correspondence reproduces that score on the ORIGINAL
    query."""
    _sin, query, dbent = _load_probe()
    db = pack_query(dbent)
    rng = np.random.default_rng(7)
    perm = rng.permutation(query.order)

    pq = TableauEntry(
        name="PERM", order=query.order,
        tabhi=query.tabhi[np.ix_(perm, perm)].copy(),
        tablo=query.tablo[np.ix_(perm, perm)].copy(),
        types=query.types[perm].copy(),
        dmat=query.dmat[np.ix_(perm, perm)].copy())
    pquery = pack_query(pq)

    r0 = golden.sa_chain(query, db, lorder=False, nrestarts=256,
                         uniforms=_uniforms(rng, query.order, 256))
    rp = golden.sa_chain(pquery, db, lorder=False, nrestarts=256,
                         uniforms=_uniforms(rng, query.order, 256))
    # both runs reach the (permutation-invariant) perfect self-match
    assert r0.maxscore == rp.maxscore == 2 * (9 * 8 // 2)

    # remap the permuted solution to original numbering and re-score it
    # against the ORIGINAL query: the score must be what the permuted
    # run reported (the invariance remap_permutation promises)
    pairs = [(k + 1, int(rp.bestmap[k]) + 1)
             for k in range(query.order) if rp.bestmap[k] >= 0]
    remapped = remap_permutation(pairs, [int(i) for i in perm])
    smap = np.full(query.order, -1, dtype=np.int64)
    for qi, dj in remapped:
        smap[qi - 1] = dj - 1
    rescore = golden.tmscord(query.tabhi, query.tablo, query.dmat,
                             query.order, db.tabhi, db.tablo, db.dmat,
                             db.order, smap)
    assert rescore == rp.maxscore
