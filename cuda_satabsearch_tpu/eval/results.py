"""Search-result file parsing and .slrtab emission.

Reimplements the consumer side of the output contract
(scripts/tsevalutils.py:69-130 parse_searchresult, :223-313
iter_searchresult multiquery splitting on '# QUERY ID =' lines;
scripts/mkroctabs.py slrtab emission).
"""

from __future__ import annotations

import re
import sys
from typing import Iterator, TextIO

import numpy as np

_QUERY_RE = re.compile(r"^#\s*QUERY\s?ID\s*=\s*(\S+)", re.IGNORECASE)


def parse_searchresult(fh: TextIO, negate: bool = False, log10: bool = False,
                       sort: bool = True):
    """[(score, domainid)] (+ comment lines), NaN lines skipped
    (tsevalutils.py:69-130).  Sorted ascending when ``sort``."""
    reslist = []
    comments = []
    for line in fh:
        if line.startswith("#"):
            comments.append(line)
            continue
        parts = line.split()
        if len(parts) < 2:
            print(f"bad line: {line.rstrip()}", file=sys.stderr)
            continue
        sid, score_str = parts[0], parts[1]
        if score_str.lower() == "nan" or score_str == "********":
            print(f"skipping NaN: {line.rstrip()}", file=sys.stderr)
            continue
        try:
            score = float(score_str)
        except ValueError:
            print(f"skipping invalid score {line.rstrip()}", file=sys.stderr)
            continue
        if log10:
            score = np.log10(score)
        if negate:
            score = -score
        reslist.append((score, sid))
    if sort:
        reslist.sort()
    return reslist, comments


# the CLI/reference LSOLN pair line format "%3d %3d"
# (cudaSaTabsearch.cu:1110-1113): two right-aligned width-3 ints
_PAIR_LINE = re.compile(
    r"^(?: {2}\d| \d\d|\d{3}) (?: {2}\d| \d\d|\d{3})\s*$")


def iter_multiquery(fh: TextIO, skip_self: bool = False
                    ) -> Iterator[tuple[str, list[tuple[float, str]]]]:
    """Yield (queryid, [(score, domainid)]) per query from a multiquery
    stream delimited by '# QUERY ID =' comment lines
    (tsevalutils.py:223-313; also accepts '# QUERYID =')."""
    qid = None
    results: list[tuple[float, str]] = []
    for line in fh:
        m = _QUERY_RE.match(line)
        if m:
            if qid is not None and results:
                yield qid, results
            qid = m.group(1)
            results = []
            continue
        if line.startswith("#") or not line.strip():
            continue
        if _PAIR_LINE.match(line):
            # an LSOLN '%3d %3d' SSE-pair line, NOT a result row —
            # without this skip a pair would parse as (score=j, id=i)
            # and silently pollute AUC inputs.  The exact fixed-width
            # form disambiguates from all-digit result ids (e.g. Nh3D
            # 7-digit compressed CATH ids never fit %3d %3d).
            continue
        parts = line.split()
        if len(parts) < 2:
            continue
        sid, score_str = parts[0], parts[1]
        try:
            score = float(score_str)
        except ValueError:
            continue
        if skip_self and qid is not None and sid.lower() == qid.lower():
            continue
        results.append((score, sid))
    if qid is not None and results:
        yield qid, results


def write_slrtab(out: TextIO, results, positives: set[str],
                 lowercase: bool = True) -> None:
    """Emit 'score label' lines for ROCR-style analysis
    (mkroctabs.py slrtab mode): label 1 if the hit is a gold-standard
    positive for the query, else 0."""
    pos = {p.lower() for p in positives} if lowercase else set(positives)
    for score, sid in results:
        key = sid.lower() if lowercase else sid
        out.write(f"{score} {1 if key in pos else 0}\n")
