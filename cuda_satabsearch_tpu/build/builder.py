"""Tableau + SSE distance matrix construction from PDB structures.

The offline DB-construction layer (SURVEY L3): a self-contained
reimplementation of the reference pipeline
buildtableauxdb.py / pytableaucreate.py -> tableaubuild.get_tableaux ->
pttableau.compute_tableau + ptdistmatrix.compute_sse_midpoint_dist_matrix,
using HELIX/SHEET records for SSE assignment (the reference's
``-t pdb`` mode) and the numpy geometry in build/geom.py.

Produces TableauEntry objects -- the same in-memory form the parser
yields -- so io/writer.py emits the identical ASCII DB format the
search engine consumes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..core import codes
from ..io.parser import TableauEntry
from . import geom
from .pdbfile import PDBStructure, read_pdb

# SSE type -> (diagonal code string, numeric code)
_TYPE_CODE = {"E": ("e", 0), "H": ("xa", 1), "I": ("xi", 2), "G": ("xg", 3)}


@dataclass
class SSE:
    kind: str  # 'E' strand, 'H' alpha, 'I' pi, 'G' 3_10
    chain: str
    start: str
    end: str
    ca: np.ndarray  # [n, 3] C-alpha coordinates
    sheet_id: str = ""

    @property
    def type_code(self) -> int:
        return _TYPE_CODE[self.kind][1]


def extract_sses(struct: PDBStructure, include_310: bool = True,
                 include_pi: bool = True,
                 min_sse_len: int | None = None) -> list[SSE]:
    """SSE list in (chain, sequence) order from HELIX/SHEET records."""
    out = []
    for h in struct.helices:
        if h.sse_type == "G" and not include_310:
            continue
        if h.sse_type == "I" and not include_pi:
            continue
        res = struct.residue_range(h.chain, h.start, h.end)
        ca = np.array([r.ca for r in res if r.ca is not None])
        if len(ca) == 0:
            continue
        out.append(SSE(kind=h.sse_type, chain=h.chain, start=h.start,
                       end=h.end, ca=ca))
    for s in struct.strands:
        res = struct.residue_range(s.chain, s.start, s.end)
        ca = np.array([r.ca for r in res if r.ca is not None])
        if len(ca) == 0:
            continue
        out.append(SSE(kind="E", chain=s.chain, start=s.start, end=s.end,
                       ca=ca, sheet_id=s.sheet_id))
    if min_sse_len:
        out = [s for s in out if len(s.ca) >= min_sse_len]

    # order by chain (file order) then position of the start residue
    chain_order = {c: i for i, c in enumerate(struct.chains)}

    def sort_key(s: SSE):
        rl = struct.chains.get(s.chain, [])
        idx = next((i for i, r in enumerate(rl) if r.resseq == s.start),
                   len(rl))
        return (chain_order.get(s.chain, 99), idx)

    out.sort(key=sort_key)
    return out


def build_entry(struct: PDBStructure, name: str | None = None,
                include_310: bool = True, include_pi: bool = True,
                min_sse_len: int | None = None, use_hk: bool = False,
                sse_id_list: list[int] | None = None,
                permutation: list[int] | None = None
                ) -> TableauEntry | None:
    """Tableau + distance-matrix entry for one structure.

    sse_id_list: 1-based SSE ids to restrict to (pytableaucreate -s).
    permutation: explicit SSE order remap (pytableaucreate -u support).
    Returns None if no SSEs were found.
    """
    sses = extract_sses(struct, include_310, include_pi, min_sse_len)
    if sse_id_list:
        sses = [sses[i - 1] for i in sse_id_list if 1 <= i <= len(sses)]
    if permutation:
        sses = [sses[i] for i in permutation]
    return entry_from_sses(sses, name if name is not None else struct.pdbid,
                           use_hk=use_hk)


def build_domain_entries(struct: PDBStructure, domains,
                         name: str | None = None,
                         include_310: bool = True, include_pi: bool = True,
                         min_sse_len: int | None = None,
                         use_hk: bool = False) -> list[TableauEntry]:
    """One entry per domain (buildtableauxdb.py -p).  SSEs are assigned
    whole to the domain holding most of their residues
    (build/domains.py); multi-domain entries are named
    ``name + str(index)`` (convdb2.py:193-195)."""
    from .domains import split_sses_by_domain

    if name is None:
        name = struct.pdbid
    sses = extract_sses(struct, include_310, include_pi, min_sse_len)
    groups = split_sses_by_domain(sses, domains)
    out = []
    for i, (_dom, dom_sses) in enumerate(groups):
        ename = name + (str(i) if len(groups) > 1 else "")
        e = entry_from_sses(dom_sses, ename, use_hk=use_hk)
        if e is not None:
            out.append(e)
    return out


def entry_from_sses(sses: list[SSE], name: str,
                    use_hk: bool = False) -> TableauEntry | None:
    """Tableau + distance-matrix entry from an SSE list; None if empty."""
    n = len(sses)
    if n == 0:
        return None

    axes = [geom.fit_axis_helix(s.ca) if s.kind != "E"
            else geom.fit_axis_strand(s.ca) for s in sses]

    types = np.array([s.type_code for s in sses], dtype=np.uint8)
    tabhi = np.zeros((n, n), dtype=np.uint8)
    tablo = np.zeros((n, n), dtype=np.uint8)
    dmat = np.zeros((n, n), dtype=np.float32)
    np.fill_diagonal(tabhi, types)
    np.fill_diagonal(tablo, types)

    for i in range(n):
        for j in range(i + 1, n):
            omega = geom.relative_angle(axes[i], axes[j])
            if omega is None:
                code = "??"
            else:
                try:
                    code = geom.angle_to_tabcode(omega)
                except ValueError:
                    # NaN omega: set parallel (pttableau.py:495-498)
                    code = "PE"
            if (use_hk and sses[i].kind == "E" and sses[j].kind == "E"
                    and sses[i].sheet_id
                    and sses[i].sheet_id == sses[j].sheet_id):
                if code[0] == "O":
                    code = "HH"
                elif code[0] == "P":
                    code = "KK"
            if code in ("HH", "KK"):
                # HH/KK extend the code alphabet (pttableau.py:500-513);
                # the search DB format does not use them (convdb2 -k off)
                hi = lo = 4
            else:
                hi, lo = codes.encode_tabcode(code)
            tabhi[i, j] = tabhi[j, i] = hi
            tablo[i, j] = tablo[j, i] = lo

            if axes[i] is None or axes[j] is None:
                d = 0.0  # convdb2.py:221-224 NaN -> 0.0
            else:
                d = float(np.linalg.norm(axes[i][1] - axes[j][1]))
            dmat[i, j] = dmat[j, i] = d

    np.fill_diagonal(dmat, types.astype(np.float32))
    return TableauEntry(name=name, order=n, tabhi=tabhi, tablo=tablo,
                        types=types, dmat=dmat)


def default_name(path: str) -> str:
    """Entry id from a PDB file path: stem sans .gz/.ent/.pdb and any
    'pdb' prefix (tableaubuild.py:883-886 naming convention)."""
    base = os.path.basename(path)
    for suf in (".gz", ".ent", ".pdb"):
        if base.endswith(suf):
            base = base[:-len(suf)]
    if base.startswith("pdb"):
        base = base[3:]
    return base


def build_from_file(path: str, name: str | None = None, **kw
                    ) -> TableauEntry | None:
    """Entry from a PDB/ASTRAL file; name defaults to the file stem."""
    if name is None:
        name = default_name(path)
    struct = read_pdb(path)
    return build_entry(struct, name=name, **kw)


def build_omega_matrix(sses: list[SSE]) -> "np.ndarray":
    """Numeric Omega (inter-axis angle, radians) matrix with the SSE
    type code on the diagonal — the reference's compute_omega_matrix
    (pttableau.py:523-568), the content behind pytableaucreate's -n/-e
    numeric output modes and the mknumerictab.sh DB variant.
    Unfittable axes / NaN angles emit 0.0 (convdb2.py NaN handling)."""
    n = len(sses)
    axes = [geom.fit_axis_helix(s.ca) if s.kind != "E"
            else geom.fit_axis_strand(s.ca) for s in sses]
    om = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        om[i, i] = sses[i].type_code
        for j in range(i + 1, n):
            w = geom.relative_angle(axes[i], axes[j])
            v = 0.0 if w is None or np.isnan(w) else float(w)
            om[i, j] = om[j, i] = v
    return om


def format_numeric(omega: "np.ndarray", fortran: bool = False,
                   degrees: bool = False,
                   permutation: list[int] | None = None) -> str:
    """Numeric-matrix text in pytableaucreate's three layouts
    (pytableaucreate.py:126-145): FORTRAN lower-triangle '%6.3f'
    (tsrchn input), full-square '% 4.3f', or the original
    TableauCreator .angles degrees format (-e; full square, degrees,
    diagonal zeroed like the angles files)."""
    n = omega.shape[0]
    perm = permutation if permutation is not None else list(range(n))
    m = omega[np.ix_(perm, perm)]
    if degrees:
        m = np.degrees(m)
        np.fill_diagonal(m, 0.0)
        return "\n".join(" ".join(f"{m[k, l]:.1f}" for l in range(n))
                         for k in range(n)) + "\n"
    if fortran:
        return "\n".join(
            " ".join(f"{0.0 if np.isnan(m[k, l]) else m[k, l]:6.3f}"
                     for l in range(k + 1))
            for k in range(n)) + "\n"
    return "\n".join(" ".join(f"{m[k, l]: 4.3f}" for l in range(n))
                     for k in range(n)) + "\n"
