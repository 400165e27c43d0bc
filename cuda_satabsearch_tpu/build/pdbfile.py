"""Minimal PDB reader for tableau construction.

Reads exactly what the builder needs, with no BioPython dependency:
C-alpha coordinates per residue per chain, and the HELIX/SHEET secondary
structure records (the reference's ``-t pdb`` mode,
scripts/ptsecstruct.py:836-930).  Supports plain and gzipped files.

ASTRAL domain files (d*.ent) carry their SSEs in standard HELIX/SHEET
records too, so this covers the reference's DB-construction inputs
without external DSSP/STRIDE binaries; a STRIDE/DSSP runner can be
layered on the same SecStruct interface when those programs exist.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass, field


@dataclass
class Residue:
    chain: str
    resseq: str  # sequence number + insertion code, stripped
    ca: tuple[float, float, float] | None


@dataclass
class Helix:
    chain: str
    start: str
    end: str
    helix_class: int  # PDB class: 1/6 alpha, 3 pi, 5 3_10

    @property
    def sse_type(self) -> str:
        if self.helix_class == 3:
            return "I"  # pi
        if self.helix_class == 5:
            return "G"  # 3_10
        return "H"  # alpha (1, 6, and anything else, ptsecstruct.py:870-877)


@dataclass
class Strand:
    chain: str
    start: str
    end: str
    sheet_id: str = ""


@dataclass
class PDBStructure:
    pdbid: str
    chains: dict  # chain -> list[Residue] in file order
    helices: list
    strands: list
    _res_index: dict = field(default_factory=dict)

    def residue_range(self, chain: str, start: str, end: str) -> list[Residue]:
        """Residues from start to end inclusive (by file order)."""
        rl = self.chains.get(chain, [])
        idx = self._res_index.setdefault(
            chain, {r.resseq: i for i, r in enumerate(rl)})
        i0 = idx.get(start)
        i1 = idx.get(end)
        if i0 is None or i1 is None or i1 < i0:
            return []
        return rl[i0:i1 + 1]


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def read_pdb(path: str, pdbid: str | None = None) -> PDBStructure:
    """Parse ATOM CA records + HELIX/SHEET cards (first model only)."""
    chains: dict[str, list[Residue]] = {}
    helices: list[Helix] = []
    strands: list[Strand] = []
    seen: dict[tuple, int] = {}
    name = pdbid
    with _open(path) as fh:
        for line in fh:
            rec = line[:6]
            if rec == "HEADER" and name is None:
                name = line[62:66].strip().lower() or None
            elif rec == "HELIX ":
                try:
                    hclass = int(line[38:40])
                except ValueError:
                    hclass = 1
                helices.append(Helix(
                    chain=(line[19].strip() or "-"),
                    start=line[21:26].strip(),
                    end=line[33:38].strip(),
                    helix_class=hclass))
            elif rec == "SHEET ":
                st = Strand(chain=(line[21].strip() or "-"),
                            start=line[22:27].strip(),
                            end=line[33:38].strip(),
                            sheet_id=line[11:14].strip())
                # duplicated strands in multiple sheets (e.g. 1MTP):
                # keep the first (ptsecstruct.py:890-892)
                key = (st.chain, st.start, st.end)
                if key not in seen:
                    seen[key] = 1
                    strands.append(st)
            elif rec == "ATOM  ":
                aname = line[12:16].strip()
                if aname != "CA":
                    continue
                altloc = line[16]
                if altloc not in (" ", "A", "1"):
                    continue  # first alternate location only
                chain = line[21].strip() or "-"
                resseq = line[22:27].strip()
                key = (chain, resseq)
                if key in seen and seen[key] == 2:
                    continue  # duplicate CA (altloc edge cases)
                seen[key] = 2
                xyz = (float(line[30:38]), float(line[38:46]),
                       float(line[46:54]))
                chains.setdefault(chain, []).append(
                    Residue(chain=chain, resseq=resseq, ca=xyz))
            elif rec == "ENDMDL":
                break  # first model only
    return PDBStructure(pdbid=name or "unknown", chains=chains,
                        helices=helices, strands=strands)


def select_chain_text(text: str, chainid: str) -> str:
    """PDB text restricted to one chain (select_pdb_chain.py twin —
    the reference round-trips through Bio.PDB's PDBIO with a chain
    Select; here the coordinate records are filtered directly):
    ATOM/HETATM/TER/ANISOU records keep only the requested chain
    (column 22, case-insensitive), HELIX/SHEET annotations likewise
    (their own chain columns), other records pass through."""
    want = chainid.upper()
    out = []
    for line in text.splitlines(keepends=True):
        rec = line[:6]
        if rec in ("ATOM  ", "HETATM", "ANISOU") or rec.startswith(
                "TER"):
            if len(line) > 21 and line[21].upper() != want:
                continue
        elif rec == "HELIX ":
            if len(line) > 19 and line[19].upper() != want:
                continue
        elif rec == "SHEET ":
            if len(line) > 21 and line[21].upper() != want:
                continue
        out.append(line)
    return "".join(out)
