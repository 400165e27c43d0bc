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
_PAIR_RE = re.compile(r"^\s*(\d+)\s+(\d+)\s*$")


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
            cur.ssemap.append((int(pm.group(1)), int(pm.group(2))))
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
