"""Protein domain decomposition for the DB-construction layer.

Functional twin of the reference's scripts/ptdomain.py: a domain is a
list of segments (contiguous residue ranges of a chain); decomposition
sources are the DDOMAIN program's output (scripts/ptdomain.py:451-584)
and the CATH Domall File format (scripts/ptdomain.py:586-727).  The
builder uses domains to split one structure into one tableau entry per
domain (buildtableauxdb.py -p; multi-domain entries are named
``pdbid + str(index)``, convdb2.py:193-195).

SSEs that cross a domain boundary are assigned whole to the domain
holding the majority of their residues — the behavioral outcome of the
reference's fixup_crossdomain_sses (scripts/ptdomain.py:760-855), which
mutates segment lists to the same effect.
"""

from __future__ import annotations

import re
import subprocess
import sys
from dataclasses import dataclass, field

_OPEN_END = 1 << 30  # open bound for cross-chain DDOMAIN segments


def int_icode(resseq: str) -> int:
    """Integer part of a PDB residue number with optional insertion
    code ('123A' -> 123; ptutils.get_int_icode equivalent)."""
    m = re.match(r"^(-?\d+)", str(resseq).strip())
    if not m:
        raise ValueError(f"bad residue number {resseq!r}")
    return int(m.group(1))


@dataclass
class Segment:
    """Contiguous residue range of one chain (ptdomain.py:55-142).
    Bounds are integer residue numbers (insertion codes stripped)."""
    chain: str
    start: int
    end: int

    def __post_init__(self):
        if self.end < self.start:
            raise ValueError(f"segment end {self.end} < start {self.start}")

    def __str__(self):
        return f"{self.chain}:{self.start}-{self.chain}:{self.end}"

    def contains(self, resnum: int) -> bool:
        return self.start <= resnum <= self.end


@dataclass
class Domain:
    """A named list of segments; Domain(None, []) with single=True is
    the whole-structure sentinel (ptdomain.py:144-170)."""
    domainid: str | None
    segments: list[Segment] = field(default_factory=list)
    single: bool = False

    def __str__(self):
        if self.single:
            return "SINGLE-DOMAIN"
        return ";".join(str(s) for s in self.segments)

    def contains(self, chain: str, resnum: int) -> bool:
        if self.single:
            return True
        return any(s.chain == chain and s.contains(resnum)
                   for s in self.segments)


SINGLE = Domain(None, [], single=True)


# ---------------------------------------------------------------------------
# DDOMAIN (Zhou et al 2007)
# ---------------------------------------------------------------------------

def parse_ddomain_output(fh) -> list[Domain]:
    """Domains from DDOMAIN program output, using the AUTHORS-trained
    parameter section (ptdomain.py:451-584).  DDOMAIN domains are a
    single segment; a segment whose start and end chains differ spans
    a chain boundary and becomes one open-ended segment per chain."""
    domains = []
    readout = False
    for line in fh:
        s = line.strip()
        if s.startswith("AUTHORS-"):
            readout = True
            continue
        if s.startswith(("SCOP-", "CATH-")):
            break
        if not readout or not s:
            continue
        parts = s.split()
        if len(parts) == 5:
            domid, c1, r1, c2, r2 = parts
        elif len(parts) == 3:  # blank chain id -> '-' (STRIDE convention)
            domid, r1, r2 = parts
            c1 = c2 = "-"
        else:
            print(f"WARNING: bad DDOMAIN line: {s}", file=sys.stderr)
            continue
        # negative residue numbers clamp to 0 and reversed same-chain
        # ranges swap with a warning, matching the reference's recovery
        # (ptdomain.py: the 1BMV case) instead of aborting the file
        r1, r2 = max(int(r1), 0), max(int(r2), 0)
        if c1 == c2 and r1 > r2:
            print(f"WARNING: DDOMAIN segment reversed ({r1} > {r2}); "
                  "swapping", file=sys.stderr)
            r1, r2 = r2, r1
        if c1 == c2:
            segs = [Segment(c1, r1, r2)]
        else:  # runs off the end of c1 into c2 (e.g. 1BAR)
            segs = [Segment(c1, r1, _OPEN_END), Segment(c2, 0, r2)]
        domains.append(Domain(domid, segs))
    if len(domains) == 1:
        return [SINGLE]
    return domains or [SINGLE]


def run_ddomain(pdb_path: str, exe: str = "DDOMAIN") -> list[Domain]:
    """Run the external DDOMAIN binary on a PDB file (reference runs it
    from ptdomain.read_domains_from_ddomain; requires the binary on
    PATH — gated, like DSSP/STRIDE in build/secstruct.py)."""
    proc = subprocess.run([exe], input=pdb_path + "\n", capture_output=True,
                          text=True, check=True)
    return parse_ddomain_output(proc.stdout.splitlines())


# ---------------------------------------------------------------------------
# CATH Domall File (CDF 2.0)
# ---------------------------------------------------------------------------

class NotInCATH(KeyError):
    """PDB id absent from the CATH Domall file (ptdomain.py:48)."""


def read_cath_domains(cdf_path: str, pdbid: str,
                      chainid: str | None = None) -> list[Domain]:
    """Domains for one PDB id from a CATH Domall File
    (ptdomain.py:586-727).  Record grammar per README.CDF_FORMAT_2.0:

        1chmA  D02 F00  1  A    2 - A  156 -  1  A  157 - A  402 -
                        N |C    S I C    E I| ...

    Domain ids are chain + 1-based number ('A1', 'A2', ...); fragments
    are ignored; '0' chain chars (pre-remediation blank) become 'A';
    reversed ranges are swapped with a warning."""
    pdbid_u = pdbid.upper()
    domains: list[Domain] = []
    found = False
    with open(cdf_path) as fh:
        for raw in fh:
            line = raw.lstrip().upper()
            if not line or line[0] == "#":
                continue
            rec = line.split()
            chain_name = rec[0]  # 5 chars: pdbid + chain
            if chain_name[:4] != pdbid_u:
                continue
            if chainid is not None and chain_name[4] != chainid.upper():
                continue
            found = True
            if rec[1][0] != "D" or rec[2][0] != "F":
                print(f"WARNING: bad CDF record ignored: {line.rstrip()}",
                      file=sys.stderr)
                continue
            num_domains = int(rec[1][1:])
            f = 3
            for domnum in range(num_domains):
                domain_id = chain_name[4] + str(domnum + 1)
                nseg = int(rec[f])
                f += 1
                segs = []
                for _ in range(nseg):
                    c1, s, _ic1, c2, e, _ic2 = rec[f:f + 6]
                    f += 6
                    if c1 != c2 or c1 != chain_name[4]:
                        print("WARNING: mismatched chain chars in CDF "
                              f"record: {line.rstrip()}", file=sys.stderr)
                    if c1 == "0":  # blank chain in old PDB records
                        c1 = "A"
                    s, e = int(s), int(e)
                    if s > e:
                        print(f"WARNING: CATH start {s} > end {e}, "
                              "swapping", file=sys.stderr)
                        s, e = e, s
                    segs.append(Segment(c1, s, e))
                domains.append(Domain(domain_id, segs))
    if not found:
        raise NotInCATH(pdbid)
    return domains or [SINGLE]


# ---------------------------------------------------------------------------
# SSE -> domain assignment
# ---------------------------------------------------------------------------

def assign_sse_domain(sse, domains: list[Domain]) -> Domain | None:
    """The domain owning an SSE: the one containing the majority of its
    residue range (ties to the earlier domain).  Whole-SSE assignment is
    the net effect of the reference's fixup_crossdomain_sses
    (ptdomain.py:760-855).  None if no domain touches the SSE."""
    start = int_icode(sse.start)
    end = int_icode(sse.end)
    best, best_count = None, 0
    for dom in domains:
        count = sum(1 for r in range(start, end + 1)
                    if dom.contains(sse.chain, r))
        if count > best_count:
            best, best_count = dom, count
    return best


def split_sses_by_domain(sses, domains: list[Domain]):
    """[(domain, [sse...])] preserving domain order; domains with no
    SSEs are dropped (tableaubuild raises NoSSE_Exception there —
    the entry is simply skipped)."""
    if len(domains) == 1 and domains[0].single:
        return [(domains[0], list(sses))]
    buckets = {id(d): [] for d in domains}
    for sse in sses:
        dom = assign_sse_domain(sse, domains)
        if dom is not None:
            buckets[id(dom)].append(sse)
    return [(d, buckets[id(d)]) for d in domains if buckets[id(d)]]
