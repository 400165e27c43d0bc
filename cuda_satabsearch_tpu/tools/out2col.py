"""Competitor-output adapters: normalize other structure-search tools'
outputs to the 2-column ``id score`` format the eval layer consumes.

Reimplements the reference's ``*out2col*`` converter family
(scripts/daliliteout2col.py, vastout2col.py, ssmxmlout2col.py,
shebaout2col.sh, yakusaout2col.sh, tableausearchout2col.py) so
published competitor results can be scored with the SAME ROC/AUC
harness (eval/__main__.py) as this framework's output — the apples-to-
apples comparison methodology of the reference's benchmark tables
(SURVEY §2.2).

Usage: python -m cuda_satabsearch_tpu.tools.out2col FORMAT < infile

Each adapter is a generator taking an iterable of input lines (or, for
ssm, a file object) and yielding (id, score_string) pairs; duplicate
target entries keep the best score (the reference's groupby-max rule,
daliliteout2col.py:82-88).
"""

from __future__ import annotations

import sys
from itertools import groupby


def _dedupe_max(pairs):
    """Keep the max score per id (scores compared numerically)."""
    out = []
    for tid, grp in groupby(sorted(pairs), key=lambda t: t[0]):
        best = max(grp, key=lambda t: float(t[1]))
        out.append((tid, best[1]))
    return out


def _fischer_id(daliid: str, fischer_ids=None) -> str:
    """DaliLite id with trailing chain (1atnA) -> Fischer-style 1atn_a;
    ids that appear chainless in the Fischer set stay chainless
    (daliliteout2col.py:40-52)."""
    if fischer_ids is None:
        from ..eval.fischer import FISCHER_ID_FOLD

        fischer_ids = FISCHER_ID_FOLD
    base = daliid[:4].lower()
    if base in fischer_ids:
        return base
    return base + "_" + daliid[4].lower()


def dalilite(lines):
    """DaliLite .dccp records: 'DCCP ...' lines carry target id and
    Z-score in fields whose position shifts when columns run together
    (daliliteout2col.py:66-78)."""
    pairs = []
    query = [None]
    for line in lines:
        f = line.split()
        if not f or f[0] != "DCCP":
            continue
        if len(f) == 10:
            tid, z, q = f[9], f[5], f[8]
        else:  # fields 2 and 3 stuck together
            tid, z, q = f[8], f[4], f[7]
        if query[0] is None:
            query[0] = q
        pairs.append((tid, z))
    out = [(_fischer_id(t), s) for t, s in _dedupe_max(pairs)]
    header = ("# QUERY ID = " + _fischer_id(query[0])) if query[0] else None
    return header, out


def vast(lines):
    """VAST web output: '<id> Nclique= ...' header then a value row
    whose 7th column is Pcli (vastout2col.py:33-48)."""
    pairs = []
    dbid = None
    value_header = False
    for line in lines:
        f = line.split()
        if not f:
            continue
        if len(f) > 1 and f[1] == "Nclique=":
            dbid = f[0]
            value_header = False
        elif f[0] == "Nres" and len(f) > 6 and f[6] == "Pcli":
            value_header = True
        elif value_header:
            pairs.append((dbid, f[6]))
            value_header = False
    return None, _dedupe_max(pairs)


def ssm(fp):
    """SSM webserver XML: every <Match> carries <Q-score> and
    <Target><name> (ssmxmlout2col.py)."""
    from xml.dom import minidom

    doc = minidom.parse(fp)
    out = []
    for match in doc.getElementsByTagName("Match"):
        def _child(node, name):
            return [c for c in node.childNodes
                    if c.nodeType == c.ELEMENT_NODE
                    and c.nodeName == name][0]

        qval = _child(match, "Q-score").firstChild.data
        sid = _child(_child(match, "Target"), "name").firstChild.data
        out.append((sid.strip(), qval.strip()))
    return None, out


def sheba(lines):
    """SHEBA -j output: the table between the ' pdb1 na pdb2 nb ...'
    header and the next blank line; cols 3 (pdb2) and 6 (m)
    (shebaout2col.sh)."""
    header = None
    out = []
    in_table = False
    for line in lines:
        if "pdb1" in line and "pdb2" in line and "%ma" in line:
            in_table = True
            continue
        if in_table:
            f = line.split()
            if not f:
                break
            if header is None:
                header = "# QUERYID = " + f[0]
            out.append((f[2], f[5]))
    # the reference's head -n -1 drops the trailing summary row
    return header, out[:-1] if out else out


def yakusa(lines):
    """YAKUSA output: 'Protein rank:' lines carry score (field 7,
    'inf' -> 99999) and id (field 9) (yakusaout2col.sh)."""
    out = []
    comments = []
    for line in lines:
        f = line.split()
        if line.startswith("Protein rank:"):
            score = f[6]
            if score == "inf":
                score = "99999"
            out.append((f[8], score))
        elif line.startswith("Description query :"):
            comments.append("# QUERY ID = " + f[6])
        elif line.startswith(("Query: ", "Database: ")):
            comments.append("# " + line.rstrip())
    return "\n".join(comments) if comments else None, out


def topscompare(lines):
    """TOPS comparison output: col 2 is the target (skip the probe
    row), truncated to 7 chars; col 1 the score (topscompareout2col.sh)."""
    out = []
    for line in lines:
        f = line.split()
        if len(f) >= 2 and f[1] != "probe":
            out.append((f[1][:7], f[0]))
    return None, out


def tableausearch(lines):
    """TableauComparer search.scores: path + 'Score-of-comparison:' +
    value; id = basename minus two extensions (tableausearchout2col.py)."""
    import os

    out = []
    for line in lines:
        f = line.split()
        if not f:
            continue
        base = os.path.basename(f[0])
        dbid = os.path.splitext(os.path.splitext(base)[0])[0]
        out.append((dbid, f[-1]))
    return None, out


FORMATS = {
    "dalilite": dalilite,
    "vast": vast,
    "ssm": ssm,
    "sheba": sheba,
    "yakusa": yakusa,
    "topscompare": topscompare,
    "tableausearch": tableausearch,
}


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1 or argv[0] not in FORMATS:
        print(f"usage: out2col {{{'|'.join(sorted(FORMATS))}}} < infile",
              file=sys.stderr)
        return 1
    fn = FORMATS[argv[0]]
    header, pairs = fn(sys.stdin) if argv[0] == "ssm" else fn(sys.stdin)
    if header:
        print(header)
    for tid, score in pairs:
        print(f"{tid}    {score}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
