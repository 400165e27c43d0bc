"""SSE-correspondence (LSOLN) output tooling.

The consumer side of the LSOLN output contract: the search CLI emits,
under each result line, one ``%3d %3d`` line per matched SSE pair
(1-based query/db SSE indices; cudaSaTabsearch.cu:1110-1113).  This
module parses that stream and provides the correspondence utilities the
reference ships as separate scripts (parsessemap.py, ssemap2pml.py,
ssepermutationremap.py, ssesubsetremap.py).
"""

from __future__ import annotations

import re
import sys
from dataclasses import dataclass, field
from typing import Iterator, TextIO

_QUERY_RE = re.compile(r"^#\s*QUERY\s?ID\s*=\s*(\S+)", re.IGNORECASE)
# strict "%3d %3d" (cudaSaTabsearch.cu:1110-1113): two right-aligned
# width-3 ints.  The exact fixed-width form keeps all-digit RESULT
# rows (e.g. Nh3D 7-digit compressed CATH ids, or wide scores) from
# being swallowed as SSE pairs.
_PAIR_RE = re.compile(
    r"^(?: {2}(\d)| (\d\d)|(\d{3})) (?: {2}(\d)| (\d\d)|(\d{3}))\s*$")


@dataclass
class SSEMapHit:
    query: str
    name: str
    score: float
    ssemap: list  # [(query_sse_1based, db_sse_1based), ...]
    fields: list = field(default_factory=list)  # full result-line tokens


def iter_ssemap_output(fh: TextIO) -> Iterator[SSEMapHit]:
    """Yield hits (with their pair lists) from LSOLN-mode CLI output."""
    qid = None
    cur: SSEMapHit | None = None
    for line in fh:
        m = _QUERY_RE.match(line)
        if m:
            if cur is not None:
                yield cur
                cur = None
            qid = m.group(1)
            continue
        if line.startswith("#") or not line.strip():
            continue
        pm = _PAIR_RE.match(line)
        if pm and cur is not None:
            qi, dj = (int(t) for t in line.split())
            cur.ssemap.append((qi, dj))
            continue
        parts = line.split()
        if len(parts) >= 2:
            if cur is not None:
                yield cur
            try:
                score = float(parts[1])
            except ValueError:
                cur = None
                continue
            cur = SSEMapHit(query=qid or "", name=parts[0], score=score,
                            ssemap=[], fields=parts)
    if cur is not None:
        yield cur


def parse_ssemap_output(fh: TextIO) -> dict:
    """{query_id: [SSEMapHit, ...]} for a whole stream."""
    out: dict = {}
    for hit in iter_ssemap_output(fh):
        out.setdefault(hit.query, []).append(hit)
    return out


def remap_permutation(ssemap, permutation) -> list:
    """Undo a query SSE permutation (ssepermutationremap.py).

    ``permutation``: list where position k (0-based) holds the original
    (0-based) SSE index that was placed at query position k.  Returns
    pairs in original numbering, sorted by query SSE.
    """
    out = [(permutation[q - 1] + 1, j) for q, j in ssemap]
    return sorted(out)


def remap_subset(ssemap, sse_id_list) -> list:
    """Undo an SSE-subset query selection (ssesubsetremap.py).

    ``sse_id_list``: the 1-based original SSE ids that formed the query
    subset, in query order.
    """
    out = [(sse_id_list[q - 1], j) for q, j in ssemap]
    return sorted(out)


# PyMOL coloring palette (ssemap2pml.py uses distinct colours per pair)
_COLORS = ["red", "orange", "yellow", "green", "cyan", "blue", "purple",
           "magenta", "salmon", "olive", "teal", "wheat", "slate", "pink",
           "limon", "deepteal"]


def write_pml(out: TextIO, query_id: str, query_sses, hit: SSEMapHit,
              hit_sses) -> None:
    """Emit a PyMOL script colouring corresponding SSEs identically.

    query_sses / hit_sses: SSE lists from build.extract_sses (each with
    .chain/.start/.end), indexed by the 1-based ssemap entries.  The
    functional equivalent of the reference's soln2ssemap.py ->
    ssemap2pml.py pipeline for our LSOLN output.
    """
    out.write(f"# SSE correspondence {query_id} -> {hit.name} "
              f"(score {hit.score:g})\n")
    out.write("hide everything\nshow cartoon\ncolor grey80\n")
    for n, (qi, dj) in enumerate(hit.ssemap):
        color = _COLORS[n % len(_COLORS)]
        try:
            qs = query_sses[qi - 1]
            hs = hit_sses[dj - 1]
        except IndexError:
            print(f"WARNING: ssemap pair ({qi},{dj}) out of range",
                  file=sys.stderr)
            continue
        out.write(f"color {color}, {query_id} and chain {qs.chain} "
                  f"and resi {qs.start}-{qs.end}\n")
        out.write(f"color {color}, {hit.name} and chain {hs.chain} "
                  f"and resi {hs.start}-{hs.end}\n")
    out.write("deselect\n")


_SCOP_SEARCH = "http://scop.mrc-lmb.cam.ac.uk/scop/search.cgi"
_CARTOON = ("/pro-origami/cgi-bin/podbget.cgi"
            "?pdbcode=%s&format=SVGINTERACTIVE&selsses=%s")


def write_html(out: TextIO, hits, dominfo: dict | None = None) -> None:
    """HTML correspondence report (ssemap2html.py:128-163 twin).

    One table row per hit, sorted by |score| descending (the
    reference's querymap_cmp uses absolute value so QP's negative and
    the heuristic's positive scores sort alike): score, pro-origami
    cartoon link with the matched db SSEs pre-selected, SCOP entry
    link, superfamily sccs link + description, fold link + description.

    ``dominfo``: {sid: (sf_sccs, sf_desc, fold_sccs, fold_desc)} —
    eval.scop.dominfo_dict (the reference's pickled scopdominfo cache);
    hits absent from it get empty classification cells instead of the
    reference's KeyError.

    Plain 2-col 'id score' output parses to hits with EMPTY SSE maps
    (selsses=none), which makes this writer double as the
    out2col2html.py / out2col2htmlscop.py twin for arbitrary search
    output, not just LSOLN streams.
    """
    import html as _html
    from urllib.parse import quote as _q

    dominfo = dominfo or {}
    out.write('<html>\n')
    out.write('<link rel="stylesheet" href="/pro-origami/style.css" />\n')
    out.write('<div id="qpresults">\n<table>\n')
    out.write('<tr><th>score<th>cartoon<th>SCOP entry'
              '<th>superfamily<th>fold</tr>\n')
    for hit in sorted(hits, key=lambda h: abs(h.score), reverse=True):
        sel = ",".join(str(j) for _i, j in hit.ssemap) or "none"
        sf_sccs, sf_desc, fold_sccs, fold_desc = dominfo.get(
            hit.name, ("", "", "", ""))
        name_h = _html.escape(hit.name)
        out.write(
            f'<tr><td>{hit.score:g}</td> '
            f'<td><a href="{_CARTOON % (_q(hit.name), sel)}">'
            f'{name_h}</a></td>'
            f'<td><a href="{_SCOP_SEARCH}?sid={_q(hit.name)}">'
            f'{name_h}</a></td>'
            f'<td><a href="{_SCOP_SEARCH}?sccs={_q(sf_sccs)}">'
            f'{_html.escape(sf_sccs)} {_html.escape(sf_desc)}</a></td>'
            f'<td><a href="{_SCOP_SEARCH}?sccs={_q(fold_sccs)}">'
            f'{_html.escape(fold_desc)}</a></td>'
            f'</tr>\n')
    out.write('</table>\n</div>\n</html>\n')


def main(argv=None) -> int:
    """CLI: LSOLN search output (stdin) -> HTML report (stdout).

    The ssemap2html.py driver surface; the pickled-cache argument is
    replaced by --cla/--des SCOP classification files (eval.scop)."""
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m cuda_satabsearch_tpu.tools.ssemap",
        description="SSE-correspondence HTML report (ssemap2html twin)")
    ap.add_argument("--cla", default=None,
                    help="SCOP(e) dir.cla file for classification cells")
    ap.add_argument("--des", default=None,
                    help="SCOP(e) dir.des file for descriptions")
    ap.add_argument("--query", default=None,
                    help="only emit hits for this query id")
    args = ap.parse_args(argv)

    dominfo = None
    if args.cla:
        from ..eval import scop
        des = scop.parse_des(args.des) if args.des else None
        dominfo = scop.dominfo_dict(scop.parse_cla(args.cla), des)
    hits = [h for h in iter_ssemap_output(sys.stdin)
            if args.query is None or h.query.lower() == args.query.lower()]
    write_html(sys.stdout, hits, dominfo)
    return 0


if __name__ == "__main__":
    sys.exit(main())
