"""Top-hit visualization bundle: PyMOL scripts + superimposed PDBs.

The generate_pml_pdb_for_top_scores.sh twin (reference
scripts/generate_pml_pdb_for_top_scores.sh:1-186): for the top-N hits
of a search-output stream, write one PyMOL colouring script and one
query-frame-superimposed PDB per hit, plus a ``loadhits_<qid>.pml``
that loads every superimposed structure.

Where the reference re-derives each correspondence by re-running the
matcher per pair (qptabmatchstructs.sh), this framework's LSOLN output
already carries the SSE map for every hit, so the bundle is produced
directly from the search stream — no per-hit re-search.

Structures are located ASTRAL-style (``<root>/<div>/<sid>.ent`` with
div = sid[2:4]) and/or in flat directories (``<dir>/<sid>.ent|.pdb``,
optionally gzipped), matching the script's ASTRAL_ROOT convention.
"""

from __future__ import annotations

import os
import sys

from .ssemap import iter_ssemap_output, write_pml
from .superimpose import superimpose_ssemap, transform_pdb_text


def find_structure(sid: str, roots, flat_dirs) -> str | None:
    """First existing structure file for ``sid`` (ASTRAL div layout in
    ``roots``, flat layout in ``flat_dirs``; .ent/.pdb, plain or .gz)."""
    cands = []
    div = sid[2:4] if len(sid) >= 4 else sid
    for r in roots:
        for ext in (".ent", ".pdb"):
            cands.append(os.path.join(r, div, sid + ext))
    for d in flat_dirs:
        for ext in (".ent", ".pdb"):
            cands.append(os.path.join(d, sid + ext))
    for c in cands:
        for path in (c, c + ".gz"):
            if os.path.isfile(path):
                return path
    return None


def _read_text(path: str) -> str:
    from ..build.pdbfile import _open  # shared gz-aware opener

    with _open(path) as fh:
        return fh.read()


def write_top_hits(hits, query_id: str, query_path: str, out_dir: str,
                   roots=(), flat_dirs=(), num_hits: int = 10,
                   log=print) -> list[str]:
    """Write the per-hit .pml/.pdb bundle; returns written hit names.

    hits: SSEMapHit list (any query mix — filtered to ``query_id``).
    Files (overwritten if present, as the reference warns):
      <out_dir>/<qid>_<dom>.pml   — SSE-pair colouring script
      <out_dir>/<qid>_<DOM>.pdb   — hit superimposed onto the query
      <out_dir>/loadhits_<qid>.pml — loads all superimposed PDBs
    """
    from ..build.builder import extract_sses
    from ..build.pdbfile import read_pdb

    os.makedirs(out_dir, exist_ok=True)
    qstruct = read_pdb(query_path, pdbid=query_id)
    qsses = extract_sses(qstruct)

    mine = [h for h in hits
            if not h.query or h.query.lower() == query_id.lower()]
    mine.sort(key=lambda h: abs(h.score), reverse=True)
    mine = mine[:num_hits]

    written = []
    loadlines = [f"# top-{num_hits} hit superpositions for {query_id}"]
    for hit in mine:
        path = find_structure(hit.name, roots, flat_dirs)
        if path is None:
            log(f"# {hit.name}: structure file not found, skipped",
                file=sys.stderr)
            continue
        hstruct = read_pdb(path, pdbid=hit.name)
        hsses = extract_sses(hstruct)
        pml_path = os.path.join(out_dir, f"{query_id}_{hit.name}.pml")
        with open(pml_path, "w") as fh:
            write_pml(fh, query_id, qsses, hit, hsses)
        try:
            R, t, rmsd = superimpose_ssemap(qsses, hsses, hit.ssemap)
        except (ValueError, IndexError) as e:
            log(f"# {hit.name}: no superposition ({e}); .pml only",
                file=sys.stderr)
            written.append(hit.name)
            continue
        pdb_path = os.path.join(out_dir,
                                f"{query_id}_{hit.name.upper()}.pdb")
        with open(pdb_path, "w") as fh:
            fh.write(f"REMARK superimposed onto {query_id} "
                     f"(score {hit.score:g}, rmsd {rmsd:.3f} A over "
                     f"{len(hit.ssemap)} SSE pairs)\n")
            fh.write(transform_pdb_text(_read_text(path), R, t))
        loadlines.append(f"load {pdb_path}")
        written.append(hit.name)

    with open(os.path.join(out_dir, f"loadhits_{query_id}.pml"),
              "w") as fh:
        fh.write("\n".join(loadlines) + "\n")
    return written


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m cuda_satabsearch_tpu.tools.tophits",
        description="PyMOL + superimposed-PDB bundle for top hits "
                    "(generate_pml_pdb_for_top_scores twin); search "
                    "output with SSE maps (LSOLN) on stdin")
    ap.add_argument("query_id", help="query identifier (SCOP sid)")
    ap.add_argument("out_dir", help="output directory (files overwritten)")
    ap.add_argument("--query-pdb", required=True,
                    help="query structure file (.ent/.pdb[.gz])")
    ap.add_argument("--astral-root", action="append", default=[],
                    help="ASTRAL pdbstyle root (div-subdir layout); "
                         "repeatable")
    ap.add_argument("--pdb-dir", action="append", default=[],
                    help="flat directory of <sid>.ent/.pdb files; "
                         "repeatable")
    ap.add_argument("-n", "--num-hits", type=int, default=10,
                    help="number of top hits (default 10)")
    args = ap.parse_args(argv)

    hits = list(iter_ssemap_output(sys.stdin))
    written = write_top_hits(hits, args.query_id, args.query_pdb,
                             args.out_dir, roots=args.astral_root,
                             flat_dirs=args.pdb_dir,
                             num_hits=args.num_hits)
    print(f"# wrote {len(written)} hit bundle(s) to {args.out_dir}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
