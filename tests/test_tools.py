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


def test_kabsch_recovers_transform():
    import numpy as np

    from cuda_satabsearch_tpu.tools.superimpose import (kabsch,
                                                        transform_pdb_text)

    rng = np.random.default_rng(5)
    P = rng.random((10, 3)) * 20
    # known rotation (about z by 30 deg) + translation
    th = np.deg2rad(30)
    R_true = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0],
                       [0, 0, 1.0]])
    t_true = np.array([1.0, -2.0, 3.0])
    Q = (R_true @ P.T).T + t_true
    R, t, rmsd = kabsch(P, Q)
    assert rmsd < 1e-9
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)

    line = ("ATOM      1  CA  ALA A   1    "
            f"{P[0,0]:8.3f}{P[0,1]:8.3f}{P[0,2]:8.3f}  1.00  0.00\n")
    moved = transform_pdb_text(line, R, t)
    got = np.array([float(moved[30:38]), float(moved[38:46]),
                    float(moved[46:54])])
    np.testing.assert_allclose(got, Q[0], atol=2e-3)


def test_superimpose_ssemap_pairs():
    import numpy as np

    from cuda_satabsearch_tpu.tools.superimpose import superimpose_ssemap

    class FakeSSE:
        def __init__(self, ca):
            self.ca = np.asarray(ca, float)

    qs = [FakeSSE([[i, 0, 0], [i, 1, 0], [i, 2, 0]]) for i in range(4)]
    # hit = query translated by (5, 5, 5)
    hs = [FakeSSE(s.ca + 5.0) for s in qs]
    R, t, rmsd = superimpose_ssemap(qs, hs, [(1, 1), (2, 2), (3, 3), (4, 4)])
    assert rmsd < 1e-9
    np.testing.assert_allclose(t, [-5, -5, -5], atol=1e-9)


def test_write_html_report():
    import io as _io

    from cuda_satabsearch_tpu.tools.ssemap import (iter_ssemap_output,
                                                   write_html)

    hits = list(iter_ssemap_output(_io.StringIO(SAMPLE)))
    dominfo = {"d1ndda_": ("d.15.1", "Ubiquitin-like",
                           "d.15", "beta-grasp")}
    buf = _io.StringIO()
    write_html(buf, hits[:2], dominfo)
    html = buf.getvalue()
    # sorted by |score| descending: d1ndda_ (54) before d2xyz__ (0.5)
    assert html.index("d1ndda_") < html.index("d2xyz__")
    # cartoon link pre-selects the matched db SSEs (reference selsses)
    assert "pdbcode=d1ndda_&format=SVGINTERACTIVE&selsses=1,2,4" in html
    assert "search.cgi?sid=d1ndda_" in html
    assert "d.15.1 Ubiquitin-like" in html
    assert "beta-grasp" in html
    # unknown sid gets empty classification cells, not a crash
    assert "d2xyz__" in html
    assert html.count("<tr>") == 3  # header + 2 hits


def test_dominfo_dict_from_cla_and_des():
    import io as _io

    from cuda_satabsearch_tpu.eval import scop

    cla = "d1ubia_\t1ubi\tA:\td.15.1.1\t123456\n"
    des = ("46456\tcl\td\t-\tAlpha and beta proteins\n"
           "46457\tcf\td.15\t-\tbeta-Grasp (ubiquitin-like)\n"
           "46458\tsf\td.15.1\t-\tUbiquitin-like\n")
    domains = scop.parse_cla(_io.StringIO(cla))
    d = scop.dominfo_dict(domains, scop.parse_des(_io.StringIO(des)))
    assert d["d1ubia_"] == ("d.15.1", "Ubiquitin-like",
                            "d.15", "beta-Grasp (ubiquitin-like)")


def test_tophits_bundle(tmp_path):
    from cuda_satabsearch_tpu.tools.ssemap import SSEMapHit
    from cuda_satabsearch_tpu.tools.tophits import (find_structure,
                                                    write_top_hits)
    from test_build import make_synthetic_pdb

    pdb_text = make_synthetic_pdb()
    qpath = tmp_path / "dquerya_.ent"
    qpath.write_text(pdb_text)
    (tmp_path / "d1hita_.ent").write_text(pdb_text)

    assert find_structure("d1hita_", (), (str(tmp_path),)) is not None
    assert find_structure("dnope__", (), (str(tmp_path),)) is None

    hits = [
        SSEMapHit(query="dquerya_", name="d1hita_", score=40.0,
                  ssemap=[(1, 1), (2, 2), (3, 3)]),
        SSEMapHit(query="dquerya_", name="dmissing", score=99.0,
                  ssemap=[(1, 1), (2, 2), (3, 3)]),
        SSEMapHit(query="other", name="d1hita_", score=1.0,
                  ssemap=[(1, 1)]),
    ]
    out_dir = tmp_path / "out"
    written = write_top_hits(hits, "dquerya_", str(qpath), str(out_dir),
                             flat_dirs=(str(tmp_path),), num_hits=10)
    # the other-query hit is filtered; the missing structure skipped
    assert written == ["d1hita_"]
    pml = (out_dir / "dquerya__d1hita_.pml").read_text()
    assert "color" in pml and "d1hita_" in pml
    pdb = (out_dir / "dquerya__D1HITA_.pdb").read_text()
    # identical structures superimpose at ~zero rmsd, coords unchanged
    assert "rmsd 0.000" in pdb
    load = (out_dir / "loadhits_dquerya_.pml").read_text()
    assert "dquerya__D1HITA_.pdb" in load


def test_ssemap_html_cli(tmp_path, capsys):
    import sys

    from cuda_satabsearch_tpu.tools import ssemap

    old = sys.stdin
    sys.stdin = io.StringIO(SAMPLE)
    try:
        rc = ssemap.main(["--query", "D1UBIA_"])
    finally:
        sys.stdin = old
    assert rc == 0
    html = capsys.readouterr().out
    assert "d1ndda_" in html and "d2xyz__" in html
    assert "<table>" in html


def test_write_html_from_plain_two_col_output():
    """A plain 2-col 'id score' stream (no LSOLN pairs) flows through
    the same parser + HTML writer — the out2col2html.py /
    out2col2htmlscop.py surface: empty SSE maps emit selsses=none."""
    import io as _io

    from cuda_satabsearch_tpu.tools.ssemap import (iter_ssemap_output,
                                                   write_html)

    stream = "# QUERY ID = D1UBIA_\nd1hita_ 42\nd2lowa_ 7\n"
    hits = list(iter_ssemap_output(_io.StringIO(stream)))
    assert all(h.ssemap == [] for h in hits)
    buf = _io.StringIO()
    write_html(buf, hits)
    html = buf.getvalue()
    assert "selsses=none" in html
    assert html.index("d1hita_") < html.index("d2lowa_")


def test_iter_ssemap_all_digit_result_rows_not_pairs():
    """Nh3D-style all-digit result rows (7-digit ids, int scores) are
    hits, not SSE pairs — only the exact '%3d %3d' form is a pair."""
    import io as _io

    from cuda_satabsearch_tpu.tools.ssemap import iter_ssemap_output

    stream = ("# QUERY ID = 1101040\n"
              "1102000 42\n"
              "3402000 30\n"
              "d1hit__ 12\n"
              "  1   3\n")
    hits = list(iter_ssemap_output(_io.StringIO(stream)))
    assert [h.name for h in hits] == ["1102000", "3402000", "d1hit__"]
    assert hits[0].ssemap == [] and hits[1].ssemap == []
    assert hits[2].ssemap == [(1, 3)]
