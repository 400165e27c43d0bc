"""3D superposition from SSE correspondences.

Reimplements scripts/superimposessemap.py: pair the central C-alpha of
each matched SSE (superimposessemap.py:151-238), find the least-squares
rotation/translation (Kabsch, the reference's Bio.PDB.Superimposer),
and optionally rewrite a hit structure's PDB coordinates transformed
into the query frame.
"""

from __future__ import annotations

import numpy as np


def kabsch(moving: np.ndarray, fixed: np.ndarray
           ) -> tuple[np.ndarray, np.ndarray, float]:
    """(R, t, rmsd) minimizing ||R @ moving.T + t - fixed.T||.

    moving/fixed: [n, 3] corresponding coordinates.
    """
    moving = np.asarray(moving, dtype=np.float64)
    fixed = np.asarray(fixed, dtype=np.float64)
    mc = moving.mean(axis=0)
    fc = fixed.mean(axis=0)
    H = (moving - mc).T @ (fixed - fc)
    U, _S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    t = fc - R @ mc
    moved = (R @ moving.T).T + t
    rmsd = float(np.sqrt(((moved - fixed) ** 2).sum(axis=1).mean()))
    return R, t, rmsd


def central_ca_pairs(query_sses, hit_sses, ssemap) -> tuple[np.ndarray,
                                                            np.ndarray]:
    """Central C-alpha of each matched SSE pair (the reference's
    'most central residue' pairing, superimposessemap.py:230-234).

    query_sses/hit_sses: SSE lists from build.extract_sses (with .ca);
    ssemap: [(query_sse_1based, db_sse_1based), ...].
    Returns (query_pts [n,3], hit_pts [n,3]).
    """
    qp, hp = [], []
    for qi, dj in ssemap:
        q = query_sses[qi - 1]
        h = hit_sses[dj - 1]
        qp.append(q.ca[len(q.ca) // 2])
        hp.append(h.ca[len(h.ca) // 2])
    return np.asarray(qp, dtype=np.float64), np.asarray(hp, np.float64)


def superimpose_ssemap(query_sses, hit_sses, ssemap
                       ) -> tuple[np.ndarray, np.ndarray, float]:
    """(R, t, rmsd) transforming the HIT structure onto the QUERY."""
    qp, hp = central_ca_pairs(query_sses, hit_sses, ssemap)
    if len(qp) < 3:
        raise ValueError("need at least 3 matched SSEs to superimpose")
    return kabsch(hp, qp)


def transform_pdb_text(text: str, R: np.ndarray, t: np.ndarray) -> str:
    """Rewrite ATOM/HETATM coordinates of a PDB file text under (R, t)
    (the reference's superimposer.apply + PDBIO output)."""
    out = []
    for line in text.splitlines(keepends=True):
        if line[:6] in ("ATOM  ", "HETATM") and len(line) >= 54:
            xyz = np.array([float(line[30:38]), float(line[38:46]),
                            float(line[46:54])])
            x, y, z = R @ xyz + t
            line = f"{line[:30]}{x:8.3f}{y:8.3f}{z:8.3f}{line[54:]}"
        out.append(line)
    return "".join(out)
