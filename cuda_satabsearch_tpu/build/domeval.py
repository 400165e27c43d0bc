"""Domain-decomposition accuracy scoring (the domeval.py twin).

Implements the Jones et al. 1998 overlap measure the reference uses to
benchmark domain parsers (scripts/domeval.py:51-171): a predicted
(test) decomposition against a gold (reference) one scores the
fraction of residues assigned to the same domain, maximized over all
domain correspondences (the two methods need not order their domains
alike — Veretnik et al. 2004); a decomposition with a DIFFERENT domain
count fails outright (score 0, counted separately).

Instead of the reference's O(n!) permutation scan with a per-residue
triple loop, the correspondence search scores every (test, ref) domain
pair once into an overlap matrix and maximizes the assignment over
permutations of that small matrix — identical result, and the
per-residue work is done once per pair.
"""

from __future__ import annotations

from itertools import permutations

from .domains import Domain


def _chain_ranges(domlist: list[Domain]) -> dict:
    """{chain: (min_resnum, max_resnum)} over the reference domains
    (domeval.py build_domain_chaindict equivalent).  The SINGLE
    sentinel spans nothing by itself — callers must pass segmented
    domains (a single-domain gold is a one-domain segmented list)."""
    out: dict = {}
    for d in domlist:
        for s in d.segments:
            lo, hi = out.get(s.chain, (s.start, s.end))
            out[s.chain] = (min(lo, s.start), max(hi, s.end))
    return out


def _disjoint(domlist: list[Domain], chain_dict: dict) -> bool:
    """No residue may belong to two domains (domeval.py
    verify_domain_disjoint)."""
    for chain, (lo, hi) in chain_dict.items():
        for r in range(lo, hi + 1):
            if sum(1 for d in domlist if d.contains(chain, r)) > 1:
                return False
    return True


def overlap_score(test_domlist: list[Domain],
                  ref_domlist: list[Domain]) -> float:
    """Best-correspondence overlap fraction for two SAME-LENGTH
    decompositions (domeval.py:51-94); 0.0 if the test decomposition
    is not disjoint."""
    assert len(test_domlist) == len(ref_domlist)
    chain_dict = _chain_ranges(ref_domlist)
    total = sum(hi - lo + 1 for lo, hi in chain_dict.values())
    if total == 0:
        return 0.0
    if not _disjoint(test_domlist, chain_dict):
        return 0.0

    n = len(ref_domlist)
    # overlap[i][j] = residues where test domain i and ref domain j
    # agree; the permutation max over this matrix equals the
    # reference's max over per-permutation rescans
    overlap = [[0] * n for _ in range(n)]
    for chain, (lo, hi) in chain_dict.items():
        for r in range(lo, hi + 1):
            ti = next((i for i, d in enumerate(test_domlist)
                       if d.contains(chain, r)), None)
            rj = next((j for j, d in enumerate(ref_domlist)
                       if d.contains(chain, r)), None)
            if ti is not None and rj is not None:
                overlap[ti][rj] += 1
    best = max(sum(overlap[i][p[i]] for i in range(n))
               for p in permutations(range(n)))
    return best / total


def domain_eval(test_domlist: list[Domain],
                ref_domlist: list[Domain]) -> tuple[str, float]:
    """The reference's domain_eval contract (domeval.py:145-169):
    ('undercut'|'overcut', 0.0) when the test decomposition has
    fewer/more domains than the gold, else ('correct', overlap score
    in [0, 1])."""
    if len(test_domlist) < len(ref_domlist):
        return ("undercut", 0.0)
    if len(test_domlist) > len(ref_domlist):
        return ("overcut", 0.0)
    return ("correct", overlap_score(test_domlist, ref_domlist))
