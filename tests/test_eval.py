"""Evaluation-harness tests: AUC semantics, multiquery parsing,
Gumbel fit recovery."""

import io

import numpy as np

from cuda_satabsearch_tpu.eval import (auc, compute_auc, fit_gumbel,
                                       iter_multiquery, parse_searchresult,
                                       roc_curve, roc_n, write_slrtab)


def test_compute_auc_trapezoid():
    # perfect ROC
    assert compute_auc([0, 0, 1], [0, 1, 1]) == 1.0
    # diagonal
    assert abs(compute_auc([0, 0.5, 1], [0, 0.5, 1]) - 0.5) < 1e-12


def test_auc_perfect_and_random():
    scores = np.array([10, 9, 8, 1, 0.5, 0.2])
    labels = np.array([1, 1, 1, 0, 0, 0])
    assert auc(scores, labels) == 1.0
    assert auc(-scores, labels) == 0.0
    # AUC equals normalized Mann-Whitney U
    rng = np.random.default_rng(0)
    s = rng.random(200)
    l = rng.integers(0, 2, 200)
    pos = s[l == 1]
    neg = s[l == 0]
    u = ((pos[:, None] > neg[None, :]).sum()
         + 0.5 * (pos[:, None] == neg[None, :]).sum())
    expect = u / (len(pos) * len(neg))
    assert abs(auc(s, l) - expect) < 1e-12


def test_auc_ties_handled():
    scores = [5, 5, 5, 5]
    labels = [1, 0, 1, 0]
    assert abs(auc(scores, labels) - 0.5) < 1e-12


def test_roc_n():
    scores = [9, 8, 7, 6, 5]
    labels = [1, 1, 0, 0, 1]
    # ROC1: first FP at rank 3, tp=2 at that point -> 2 / (1*3)
    assert abs(roc_n(scores, labels, 1) - 2 / 3) < 1e-12
    assert roc_n([3, 2, 1], [1, 1, 1, ][:3], 50) >= 0  # no crash npos only?


def test_parse_searchresult_skips_nan():
    text = "# comment\nd1aaaa_ 5.0\nd2bbbb_ nan\nd3cccc_ 1.0\nbadline\n"
    res, comments = parse_searchresult(io.StringIO(text))
    assert res == [(1.0, "d3cccc_"), (5.0, "d1aaaa_")]
    assert comments == ["# comment\n"]


def test_iter_multiquery_splits():
    text = ("# tpusatabsearch LTYPE = T LORDER = T LSOLN = F\n"
            "# QUERY ID = d1ubia_\n"
            "# DBFILE = x\n"
            "d1aaaa_ 5 1.0 0.5 0.1\n"
            "d2bbbb_ 3 0.5 0.2 0.3\n"
            "# QUERY ID = d2phlb1\n"
            "d1aaaa_ 7 1.0 0.5 0.1\n")
    out = list(iter_multiquery(io.StringIO(text)))
    assert out[0][0] == "d1ubia_"
    assert out[0][1] == [(5.0, "d1aaaa_"), (3.0, "d2bbbb_")]
    assert out[1] == ("d2phlb1", [(7.0, "d1aaaa_")])
    # self-skip
    text2 = "# QUERY ID = d1aaaa_\nd1aaaa_ 9\nd2bbbb_ 1\n"
    out2 = list(iter_multiquery(io.StringIO(text2), skip_self=True))
    assert out2[0][1] == [(1.0, "d2bbbb_")]


def test_write_slrtab():
    buf = io.StringIO()
    write_slrtab(buf, [(5.0, "d1aaaa_"), (3.0, "D2BBBB_")], {"d2bbbb_"})
    assert buf.getvalue() == "5.0 0\n3.0 1\n"


def test_fit_gumbel_recovers_params():
    rng = np.random.default_rng(42)
    a_true, b_true = 0.378, 0.358  # the reference's shipped params
    n = 200000
    u = rng.random(n)
    samples = a_true - b_true * np.log(-np.log(u))
    a, b = fit_gumbel(samples)
    assert abs(a - a_true) < 0.01
    assert abs(b - b_true) < 0.01


def test_norms():
    from cuda_satabsearch_tpu.stats.norms import (empirical_zscores, norm1,
                                                  norm2, norm3)

    assert norm1(10, 4, 8) == 2.5
    assert norm2(10, 4, 8) == 10 / 6.0
    assert norm3(10, 4, 8) == 2.5
    assert norm3(10, 1, 8) == 0.0  # 7/8 > 0.75 size difference
    z = empirical_zscores([1.0, 2.0, 3.0])
    assert abs(z[1]) < 1e-12 and z[2] > 0
