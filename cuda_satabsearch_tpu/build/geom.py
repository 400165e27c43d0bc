"""Axis fitting and interaxial-angle geometry for tableau construction.

Numpy reimplementation of the reference's geometry
(scripts/ptnode.py fit_axis :1113-1292 (helix) / :1846-2005 (strand),
relative_angle :752-883; scripts/geometry.py LineLineIntersect :18-80):

* helix axis: SVD major axis of the midpoints of consecutive C-alpha
  triples (Kamat & Lesk 2007 / TableauCreator method);
* strand axis: SVD major axis of consecutive C-alpha pair midpoints
  about the C-alpha centroid (pleat smoothing, Cohen et al 1981);
* both oriented N->C, with short-SSE fallbacks;
* omega: signed angle between the planes defined by the two axes and
  their mutual perpendicular (double-quadrant encoded downstream).
"""

from __future__ import annotations

import numpy as np

ALPHA = 100.0  # multiplier of dircos for the second line point (ptnode.py:43)
EPS_LL = 1.0e-8  # LineLineIntersect epsilon (geometry.py:50)


def fit_axis_helix(ca: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """(dircos, centroid) for a helix from its [n,3] C-alpha coords."""
    n = len(ca)
    if n < 3:
        return None
    mid = (ca[:-2] + ca[2:]) / 2.0  # midpoint of each consecutive triple:
    # ca[i] + ((ca[i-1]-ca[i]) + (ca[i+1]-ca[i]))/2 == (ca[i-1]+ca[i+1])/2
    if n >= 4:
        centroid = mid.mean(axis=0)
        return _svd_axis(mid - centroid, mid[0], mid[-1], centroid)
    # 3 residues: line through the two consecutive-PAIR midpoints
    # (ptnode.py:1258-1290)
    mp1 = (ca[0] + ca[1]) / 2.0
    mp2 = (ca[1] + ca[2]) / 2.0
    centroid = (mp1 + mp2) / 2.0
    v = mp2 - mp1
    return v / np.linalg.norm(v), centroid


def fit_axis_strand(ca: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """(dircos, centroid) for a strand from its [n,3] C-alpha coords."""
    n = len(ca)
    if n < 2:
        return None
    centroid = ca.mean(axis=0)  # centroid of the ATOMS (ptnode.py:1891-1895)
    if n > 3:
        mid = (ca[:-1] + ca[1:]) / 2.0
        return _svd_axis(mid - centroid, ca[0], ca[-1], centroid)
    if n == 3:
        v = (ca[1] + ca[2]) / 2.0 - (ca[0] + ca[1]) / 2.0
    else:
        v = ca[1] - ca[0]
    return v / np.linalg.norm(v), centroid


def _svd_axis(rows: np.ndarray, nterm_pt: np.ndarray, cterm_pt: np.ndarray,
              centroid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Major right-singular vector, oriented from N- to C-terminus."""
    _, _, vt = np.linalg.svd(rows, full_matrices=False)
    dircos = vt[0]
    # orient via the projections of the terminal points onto the axis
    # (equivalently: sign of (cterm - nterm) . dircos, ptnode.py:1216-1236)
    if float(np.dot(cterm_pt - nterm_pt, dircos)) < 0.0:
        dircos = -dircos
    return dircos, centroid


def line_line_intersect(p1, p2, p3, p4):
    """Shortest segment (pa, pb, mua, mub) between lines P1P2 and P3P4
    (Paul Bourke's algorithm; geometry.py:18-80), or None."""
    p1, p2, p3, p4 = (np.asarray(x, dtype=np.float64)
                      for x in (p1, p2, p3, p4))
    p13 = p1 - p3
    p43 = p4 - p3
    if np.all(np.abs(p43) < EPS_LL):
        return None
    p21 = p2 - p1
    if np.all(np.abs(p21) < EPS_LL):
        return None
    d1343 = float(p13 @ p43)
    d4321 = float(p43 @ p21)
    d1321 = float(p13 @ p21)
    d4343 = float(p43 @ p43)
    d2121 = float(p21 @ p21)
    denom = d2121 * d4343 - d4321 * d4321
    if abs(denom) < EPS_LL:
        return None
    mua = (d1343 * d4321 - d1321 * d4343) / denom
    mub = (d1343 + d4321 * mua) / d4343
    return p1 + mua * p21, p3 + mub * p43, mua, mub


def relative_angle(axis_i, axis_j) -> float | None:
    """Signed interaxial angle omega in (-pi, pi] between SSE i and j.

    Mirrors ptnode.py relative_angle(self=i, SSE1=j): points A on j's
    axis and D on i's axis at centroid + 100*dircos; B, C the mutual
    perpendicular feet on j and i; omega the signed dihedral looking
    along BC (ptnode.py:752-883).
    """
    if axis_i is None or axis_j is None:
        return None
    di, ci = axis_i
    dj, cj = axis_j
    pa = cj + ALPHA * dj
    pd = ci + ALPHA * di
    hit = line_line_intersect(cj, pa, ci, pd)
    if hit is None:
        return None
    pb, pc, _, _ = hit
    v1 = pb - pa
    v2 = pc - pb
    v3 = pd - pc
    n1 = np.cross(v1, v2)
    n2 = np.cross(v2, v3)
    n1n = np.linalg.norm(n1)
    n2n = np.linalg.norm(n2)
    if n1n == 0.0 or n2n == 0.0:
        return None
    n1 = n1 / n1n
    n2 = n2 / n2n
    dp = float(np.clip(np.dot(n1, n2), -1.0, 1.0))
    omega = float(np.arccos(dp))
    if float(np.dot(v2, np.cross(n1, n2))) < 0.0:
        omega = -omega
    return omega


def angle_to_tabcode(omega: float) -> str:
    """Double-quadrant encoding of omega (pttableau.py:434-469)."""
    pi = np.pi
    if -pi / 4 < omega <= pi / 4:
        code = "P"
    elif pi / 4 < omega <= 3 * pi / 4:
        code = "R"
    elif (3 * pi / 4 < omega <= pi) or (-pi < omega <= -3 * pi / 4):
        code = "O"
    elif -3 * pi / 4 < omega <= -pi / 4:
        code = "L"
    else:
        raise ValueError(f"bad omega value {omega}")
    if 0 < omega <= pi / 2:
        code += "D"
    elif pi / 2 < omega <= pi:
        code += "T"
    elif -pi < omega <= -pi / 2:
        code += "S"
    elif -pi / 2 < omega <= 0:
        code += "E"
    else:
        raise ValueError(f"bad omega value {omega}")
    return code
