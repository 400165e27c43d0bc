"""Tableau-construction CLI: PDB file(s) -> ASCII tableaux+distmatrix DB.

The functional union of the reference's DB-construction entry points
(scripts/buildtableauxdb.py, pytableaucreate.py, convdb2.py):

  single file -> entry on stdout:
      python -m cuda_satabsearch_tpu.build  file.pdb[.gz]
  directory tree -> whole DB on stdout, size-sorted:
      python -m cuda_satabsearch_tpu.build -o db.ascii -s  pdbdir/

Flags mirror the reference (buildtableauxdb.py:230-280): -3 include
3_10 helices, -5 include pi helices, -k HH/KK sheet codes, -m MINLEN
minimum SSE length.  SSE assignment uses the PDB's own HELIX/SHEET
records (the reference's ``-t pdb`` mode); DSSP/STRIDE integration can
be added behind -t when those binaries are present.
"""

from __future__ import annotations

import argparse
import os
import sys

from ..io.writer import format_database, format_entry
from .builder import build_from_file, default_name as _default_name


def iter_pdb_files(root: str):
    exts = (".pdb", ".ent", ".pdb.gz", ".ent.gz")
    for dirpath, _dirnames, filenames in sorted(os.walk(root)):
        for fn in sorted(filenames):
            if fn.endswith(exts):
                yield os.path.join(dirpath, fn)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="tpusatabsearch-build",
        description="Build tableau+distmatrix ASCII entries from PDB files")
    ap.add_argument("paths", nargs="+",
                    help="PDB/ASTRAL files or directories to walk")
    ap.add_argument("-3", dest="incl_310", action="store_true",
                    help="include 3_10 helices")
    ap.add_argument("-5", dest="incl_pi", action="store_true",
                    help="include pi helices")
    ap.add_argument("-k", dest="use_hk", action="store_true",
                    help="use HH/KK codes for same-sheet strands")
    ap.add_argument("-m", dest="min_sse_len", type=int, default=None,
                    help="minimum SSE length")
    ap.add_argument("-s", dest="sort_size", action="store_true",
                    help="sort output DB by size ascending (convdb2 -s; "
                         "improves search load balance)")
    ap.add_argument("-o", dest="output", default=None,
                    help="output file (default stdout)")
    ap.add_argument("--name", default=None,
                    help="entry identifier (single-file mode)")
    ap.add_argument("--sse-ids", default=None,
                    help="comma-separated 1-based SSE ids to restrict the "
                         "tableau to (pytableaucreate -s substructure mode)")
    ap.add_argument("-u", dest="permute", action="store_true",
                    help="randomly permute SSE order (pytableaucreate -u); "
                         "the permutation is printed to stderr for "
                         "remapping with tools.remap_permutation")
    ap.add_argument("--permute-seed", type=int, default=0)
    ap.add_argument("-n", dest="numeric", action="store_true",
                    help="emit the numeric Omega (radians) matrix "
                         "instead of the discrete tableau "
                         "(pytableaucreate -n; FORTRAN lower-triangle "
                         "layout)")
    ap.add_argument("--degrees", action="store_true",
                    help="with -n: full-square degrees layout (the "
                         "original TableauCreator .angles format, "
                         "pytableaucreate -e)")
    ap.add_argument("-t", dest="secstruct", default="pdb",
                    choices=("pdb", "dssp", "stride"),
                    help="SSE assignment source (buildtableauxdb -t): "
                         "'pdb' uses HELIX/SHEET records; dssp/stride "
                         "run the external binary")
    ap.add_argument("-p", dest="domains", default="none",
                    help="domain decomposition (buildtableauxdb -p): "
                         "'none' (default), 'ddomain' (runs the DDOMAIN "
                         "binary), or 'cath:CDF_FILE' (CATH Domall file); "
                         "multi-domain structures emit one entry per "
                         "domain named NAME+index")
    args = ap.parse_args(argv)
    if args.domains != "none" and (args.sse_ids or args.permute):
        ap.error("-p cannot be combined with --sse-ids/-u")
    if args.numeric and args.domains != "none":
        ap.error("-n cannot be combined with -p")
    sse_id_list = ([int(x) for x in args.sse_ids.split(",")]
                   if args.sse_ids else None)

    files = []
    for p in args.paths:
        if os.path.isdir(p):
            files.extend(iter_pdb_files(p))
        else:
            files.append(p)

    entries = []
    numeric_chunks = []  # (name, omega, perm) per file in -n mode
    for path in files:
        try:
            name1 = args.name if len(files) == 1 else None
            if args.secstruct != "pdb":
                from .secstruct import read_pdb_with_secstruct

                struct = read_pdb_with_secstruct(path, args.secstruct)
            else:
                from .pdbfile import read_pdb

                struct = read_pdb(path)
            if args.domains != "none":
                from .builder import build_domain_entries
                from .domains import read_cath_domains, run_ddomain

                if args.domains.startswith("cath:"):
                    pid = struct.pdbid or _default_name(path)[:4]
                    doms = read_cath_domains(args.domains[5:], pid)
                elif args.domains == "ddomain":
                    doms = run_ddomain(path)
                else:
                    ap.error(f"bad -p value {args.domains!r}")
                new = build_domain_entries(
                    struct, doms, name=name1 or _default_name(path),
                    include_310=args.incl_310, include_pi=args.incl_pi,
                    min_sse_len=args.min_sse_len, use_hk=args.use_hk)
                if not new:
                    print(f"WARNING: no SSEs found in {path}",
                          file=sys.stderr)
                entries.extend(new)
                continue
            from .builder import build_entry, extract_sses

            # the -u permutation probe counts SSEs from the SAME
            # secstruct source and subset the real build uses (a PDB-
            # record probe against -t dssp/stride produced wrong-length
            # permutations); out-of-range --sse-ids are dropped BEFORE
            # sizing the permutation for the same reason
            perm = None
            sses_all = extract_sses(struct, args.incl_310,
                                    args.incl_pi, args.min_sse_len)
            eff_ids = ([i for i in sse_id_list
                        if 1 <= i <= len(sses_all)]
                       if sse_id_list else None)
            if args.permute:
                import numpy as _np

                n = len(eff_ids) if eff_ids is not None else len(
                    sses_all)
                if n:
                    rng = _np.random.default_rng(args.permute_seed)
                    perm = list(rng.permutation(n))
                    print(f"permutation {path}: "
                          + ",".join(str(p + 1) for p in perm),
                          file=sys.stderr)
            if args.numeric:
                from .builder import build_omega_matrix

                sses = ([sses_all[i - 1] for i in eff_ids]
                        if eff_ids is not None else sses_all)
                if not sses:
                    print(f"WARNING: no SSEs found in {path}",
                          file=sys.stderr)
                    continue
                numeric_chunks.append(
                    (name1 or _default_name(path),
                     build_omega_matrix(sses), perm))
                continue
            e = build_entry(
                struct, name=name1 or _default_name(path),
                include_310=args.incl_310, include_pi=args.incl_pi,
                min_sse_len=args.min_sse_len, use_hk=args.use_hk,
                sse_id_list=eff_ids, permutation=perm)
        except Exception as exc:  # keep walking the tree
            print(f"ERROR: {path}: {exc}", file=sys.stderr)
            continue
        if e is None:
            print(f"WARNING: no SSEs found in {path}", file=sys.stderr)
            continue
        entries.append(e)

    out = open(args.output, "w") if args.output else sys.stdout
    try:
        if args.numeric:
            # 'name order' headers + omega matrices (mknumerictab.sh
            # family), honoring -t/-u/--sse-ids exactly like the
            # discrete path (ONE structure pass, shared above)
            from .builder import format_numeric
            for name, om, perm in numeric_chunks:
                out.write(f"{name} {om.shape[0]}\n")
                out.write(format_numeric(
                    om, fortran=not args.degrees,
                    degrees=args.degrees, permutation=perm))
            print(f"built {len(numeric_chunks)} numeric matrices from "
                  f"{len(files)} files", file=sys.stderr)
            return 0
        if len(entries) == 1 and not args.sort_size:
            out.write(format_entry(entries[0]))
        else:
            out.write(format_database(entries, sort_by_size=args.sort_size))
    finally:
        if args.output:
            out.close()
    print(f"built {len(entries)} entries from {len(files)} files",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
