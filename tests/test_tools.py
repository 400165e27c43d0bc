"""LSOLN ssemap tooling tests."""

import io

from cuda_satabsearch_tpu.tools import (iter_ssemap_output,
                                        parse_ssemap_output,
                                        remap_permutation, remap_subset)

SAMPLE = """\
# tpusatabsearch LTYPE = T LORDER = T LSOLN = T
# QUERY ID = D1UBIA_
# DBFILE = tableauxdistmatrixdb.test.ascii
d1ndda_  54 6.75 13.4176 1.88662e-08
  1   1
  2   2
  3   4
d2xyz__  7 0.5 -1.2 0.9
  2   5
# QUERY ID = d2phlb1
d1ndda_  10 1.0 0.5 0.3
"""


def test_iter_ssemap_output():
    hits = list(iter_ssemap_output(io.StringIO(SAMPLE)))
    assert len(hits) == 3
    assert hits[0].query == "D1UBIA_"
    assert hits[0].name == "d1ndda_"
    assert hits[0].score == 54
    assert hits[0].ssemap == [(1, 1), (2, 2), (3, 4)]
    assert hits[1].ssemap == [(2, 5)]
    assert hits[2].query == "d2phlb1"
    assert hits[2].ssemap == []


def test_parse_groups_by_query():
    d = parse_ssemap_output(io.StringIO(SAMPLE))
    assert set(d) == {"D1UBIA_", "d2phlb1"}
    assert len(d["D1UBIA_"]) == 2


def test_remap_permutation():
    # query position k held original SSE permutation[k]
    perm = [2, 0, 1]  # query sse1 was original 3, sse2 was 1, sse3 was 2
    assert remap_permutation([(1, 4), (2, 5)], perm) == [(1, 5), (3, 4)]


def test_remap_subset():
    sse_ids = [3, 5, 8]
    assert remap_subset([(1, 2), (3, 4)], sse_ids) == [(3, 2), (8, 4)]
