"""Reference-geometry oracle: runs the UNMODIFIED reference tableau
geometry code (/root/reference/scripts/ptnode.py fit_axis /
relative_angle, geometry.py LineLineIntersect) under python3 with a
minimal Bio.PDB.Vector compatibility shim, to validate our
build/geom.py against the exact upstream algebra (axis orientation,
mutual-perpendicular construction, omega sign convention).

No reference code is copied into the repo: sources are read from
/root/reference at test time (tests skip when absent), the same
out-of-tree-oracle methodology as tools/refgolden uses for the kernel.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF_SCRIPTS = "/root/reference/scripts"


class Vector:
    """Bio.PDB.Vector semantics subset used by ptnode/geometry:
    '*' = dot product, '**' = cross product, '+'/'-' accept Vector or
    ndarray, '/' scalar division, norm/normsq/normalized/angle/
    get_array/indexing/iteration."""

    def __init__(self, x, y=None, z=None):
        if y is None:
            self._a = np.array(x, dtype=np.float64)
        else:
            self._a = np.array([x, y, z], dtype=np.float64)

    def get_array(self):
        return self._a.copy()

    def __getitem__(self, i):
        return self._a[i]

    def __iter__(self):
        return iter(self._a)

    def __len__(self):
        return 3

    def __repr__(self):
        return f"<Vector {self._a}>"

    def _other(self, o):
        return o._a if isinstance(o, Vector) else np.asarray(o)

    def __add__(self, o):
        return Vector(self._a + self._other(o))

    __radd__ = __add__

    def __sub__(self, o):
        return Vector(self._a - self._other(o))

    def __rsub__(self, o):
        return Vector(self._other(o) - self._a)

    def __mul__(self, o):
        if isinstance(o, Vector):
            return float(self._a @ o._a)  # dot product
        return Vector(self._a * o)  # scalar

    __rmul__ = __mul__

    def __truediv__(self, s):
        return Vector(self._a / s)

    __div__ = __truediv__

    def __pow__(self, o):
        if isinstance(o, Vector):
            return Vector(np.cross(self._a, o._a))
        return Vector(self._a * o)

    def __neg__(self):
        return Vector(-self._a)

    def norm(self):
        return float(np.linalg.norm(self._a))

    def normsq(self):
        return float(self._a @ self._a)

    def normalized(self):
        return Vector(self._a / np.linalg.norm(self._a))

    def angle(self, o):
        n1 = self._a / np.linalg.norm(self._a)
        n2 = o._a / np.linalg.norm(o._a)
        return float(np.arccos(np.clip(n1 @ n2, -1.0, 1.0)))


def _exec_module(path, extra_globals):
    g = dict(extra_globals)
    g["__name__"] = "_refgeom_" + path.rsplit("/", 1)[-1].split(".")[0]
    g["__file__"] = path
    with open(path) as fh:
        src = fh.read()
    exec(compile(src, path, "exec"), g)
    return g


def _fake_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def load(full: bool = False):
    """Exec the reference geometry.py + ptnode.py with stub deps;
    returns the ptnode namespace dict, or None if unavailable.

    With ``full=True`` also execs the reference pttableau.py and
    ptdistmatrix.py (the tableau/distance-matrix ASSEMBLY layer,
    pttableau.py:473-570 compute_tableau/compute_omega_matrix and
    ptdistmatrix.py:1017-1066 compute_sse_midpoint_dist_matrix) and
    returns the dict {"ptnode": ns, "pttableau": ns, "ptdistmatrix":
    ns} instead."""
    import os

    if not os.path.exists(os.path.join(REF_SCRIPTS, "ptnode.py")):
        return None

    def calc_dihedral(v1, v2, v3, v4):
        ab = v1 - v2
        cb = v3 - v2
        db = v4 - v3
        u = ab ** cb
        v = db ** cb
        w = u ** v
        angle = u.angle(v)
        if cb * w > 1e-6:
            angle = -angle
        return angle

    saved = dict(sys.modules)
    try:
        la = _fake_module("oldnumeric.linear_algebra",
                          singular_value_decomposition=(
                              lambda a: np.linalg.svd(
                                  np.asarray(a, dtype=np.float64),
                                  full_matrices=False)))
        oldnum = _fake_module("oldnumeric", array=np.array,
                              zeros=np.zeros, Float=np.float64,
                              sqrt=np.sqrt, sum=np.sum,
                              linear_algebra=la)
        biopdb = _fake_module("Bio.PDB", Vector=Vector,
                              calc_dihedral=calc_dihedral,
                              # class/ctor stubs pttableau.py's unused
                              # TableauCreator wrapper section needs at
                              # module scope (DomainSelect base etc.)
                              Select=object, PDBIO=object,
                              PDBParser=object)
        bio = _fake_module("Bio", PDB=biopdb)
        sys.modules.update({
            "oldnumeric": oldnum,
            "oldnumeric.linear_algebra": la,
            "Bio": bio,
            "Bio.PDB": biopdb,
        })
        # geometry.py: `from numpy import *` + `from Bio.PDB import
        # Vector` (resolved against the shim via sys.modules).
        # `alltrue` was dropped from numpy 2's namespace; pre-seed it
        # (the star-import no longer rebinds it).
        geom_ns = _exec_module(os.path.join(REF_SCRIPTS, "geometry.py"),
                               {"__builtins__": __builtins__,
                                "alltrue": np.all})
        sys.modules.update({
            "ptsecstruct": _fake_module(
                "ptsecstruct",
                stride_chainid_to_pdb_chainid=lambda c: c,
                pdb_chainid_to_stride_chainid=lambda c: c),
            "ptmfile": _fake_module(
                "ptmfile",
                mfile_write_strand=lambda *a, **k: None,
                mfile_write_helix=lambda *a, **k: None),
            "ptutils": _fake_module(
                "ptutils",
                get_int_icode=lambda s: (int(s), None),
                biopdbresid_to_pdbresseq=lambda r: str(r[1]),
                char_if_not_blank=lambda c: c if c != " " else ""),
            "geometry": _fake_module(
                "geometry",
                LineLineIntersect=geom_ns["LineLineIntersect"],
                ProjectPointOntoLine=geom_ns["ProjectPointOntoLine"]),
        })
        ns = _exec_module(os.path.join(REF_SCRIPTS, "ptnode.py"), {
            "__builtins__": __builtins__})
        if not full:
            return ns
        # the assembly layer on top: pttableau + ptdistmatrix, with the
        # ptnode namespace exposed as an importable module (their
        # `from ptnode import *`) plus the python-2 `sets` shim
        ptnode_mod = types.ModuleType("ptnode")
        for k, v in ns.items():
            if not k.startswith("_"):
                setattr(ptnode_mod, k, v)
        sys.modules.update({
            "ptnode": ptnode_mod,
            "sets": _fake_module("sets", Set=set),
            "ptdomain": _fake_module("ptdomain", PTDomain=object),
        })
        sys.modules["ptutils"].cleanup_tmpdir = lambda *a, **k: None
        pttab = _exec_module(os.path.join(REF_SCRIPTS, "pttableau.py"),
                             {"__builtins__": __builtins__})
        pdist = _exec_module(os.path.join(REF_SCRIPTS, "ptdistmatrix.py"),
                             {"__builtins__": __builtins__})
        return {"ptnode": ns, "pttableau": pttab, "ptdistmatrix": pdist}
    finally:
        sys.modules.clear()
        sys.modules.update(saved)


class _FakeAtom:
    def __init__(self, xyz):
        self._v = Vector(xyz)

    def get_vector(self):
        return self._v


class _FakeResidue:
    def __init__(self, ca_xyz):
        self._ca = _FakeAtom(ca_xyz)

    def __getitem__(self, name):
        assert name == "CA"
        return self._ca


def make_node(ns, kind: str, ca_coords: np.ndarray):
    """A reference PTNodeHelix/PTNodeStrand instance whose
    get_residue_list() serves the given [n,3] C-alpha coordinates
    (bypasses __init__; only the fit_axis/relative_angle surface is
    populated)."""
    cls = ns["PTNodeHelix"] if kind == "helix" else ns["PTNodeStrand"]
    node = cls.__new__(cls)
    node.nodeid = f"{kind}0"
    node.seqnum = 0
    node.axis_direction_cosines = None
    node.axis_centroid = None
    residues = [_FakeResidue(xyz) for xyz in np.asarray(ca_coords)]
    node.get_residue_list = lambda: residues
    return node


_HELIXTYPE = {"H": "ALPHA", "I": "PI", "G": "310"}


def make_node4(ns, kind4: str, ca_coords: np.ndarray, seqnum: int,
               resid_dict: dict):
    """A fully-populated reference node for the ASSEMBLY oracle: kind4
    in 'H'/'I'/'G' (alpha/pi/310 helix) or 'E' (strand), with the
    chainid/start_res_seq/pdb_resid_dict surface PTNode.__lt__ and the
    diagonal type-coding (get_type / isinstance) need."""
    node = make_node(ns, "strand" if kind4 == "E" else "helix", ca_coords)
    node.nodeid = f"sse{seqnum}"
    node.seqnum = seqnum
    node.chainid = "A"
    node.start_res_seq = seqnum
    node.end_res_seq = seqnum
    node.pdb_resid_dict = resid_dict
    if kind4 == "E":
        node.sheet_id = None
    else:
        node.helixtype = _HELIXTYPE[kind4]
    return node


def ref_fit_axis(ns, kind: str, ca_coords: np.ndarray):
    """(dircos ndarray, centroid ndarray) from the reference fit_axis,
    or None."""
    node = make_node(ns, kind, ca_coords)
    out = node.fit_axis(None)
    if out is None:
        return None
    dircos, centroid = out
    return (np.asarray(dircos.get_array(), dtype=np.float64),
            np.asarray(centroid.get_array() if hasattr(centroid, "get_array")
                       else centroid, dtype=np.float64))


def ref_angle_to_tabcode(omega: float) -> str:
    """The reference's double-quadrant encoder, extracted at runtime
    from pttableau.py (the full module drags in Bio.PDB/ptdomain; the
    encoder itself is a standalone pure function)."""
    global _ANGLE_TO_TABCODE
    if _ANGLE_TO_TABCODE is None:
        import os

        path = os.path.join(REF_SCRIPTS, "pttableau.py")
        with open(path) as fh:
            src = fh.read()
        start = src.index("def angle_to_tabcode")
        end = src.index("\ndef ", start + 1)
        ns = {"pi": np.pi, "__builtins__": __builtins__}
        exec(compile(src[start:end], path, "exec"), ns)
        _ANGLE_TO_TABCODE = ns["angle_to_tabcode"]
    return _ANGLE_TO_TABCODE(omega)


_ANGLE_TO_TABCODE = None


def ref_relative_angle(ns, kind_i: str, ca_i, kind_j: str, ca_j):
    """omega = node_i.relative_angle(node_j) from the reference, or
    None.  NOTE the reference call convention: self = node_i, SSE1 =
    node_j (our build/geom.relative_angle(axis_i, axis_j) mirrors it)."""
    node_i = make_node(ns, kind_i, ca_i)
    node_j = make_node(ns, kind_j, ca_j)
    return node_i.relative_angle(node_j, None)
