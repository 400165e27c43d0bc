"""External secondary-structure program integration (DSSP / STRIDE).

Completes the reference's ptsecstruct.py surface: besides the built-in
PDB HELIX/SHEET-record mode (build/pdbfile.py), SSEs can be assigned by
an external DSSP (``mkdssp``/``dssp``) or STRIDE binary when one is
installed.  The parsed assignments are converted to the same
Helix/Strand records read_pdb produces, so the rest of the builder is
agnostic to the source (the reference's ``-t dssp|stride|pdb`` flag).

DSSP H/G/I -> helix classes 1/5/3; E -> strand.  Consecutive residues
of the same SSE letter form one SSE, split on chain breaks
(ptsecstruct.py's DSSP/STRIDE parse, :240-520).
"""

from __future__ import annotations

import shutil
import subprocess

from .pdbfile import Helix, PDBStructure, Strand, read_pdb

_HELIX_CLASS = {"H": 1, "G": 5, "I": 3}


def find_program(name: str) -> str | None:
    candidates = {"dssp": ["mkdssp", "dssp", "dssp4"],
                  "stride": ["stride"]}[name]
    for c in candidates:
        path = shutil.which(c)
        if path:
            return path
    return None


def _runs_to_sses(assign: list) -> tuple[list, list]:
    """[(chain, resseq, letter)] -> (helices, strands) of maximal runs."""
    helices, strands = [], []
    i, n = 0, len(assign)
    while i < n:
        chain, start, letter = assign[i]
        j = i
        while (j + 1 < n and assign[j + 1][0] == chain
               and assign[j + 1][2] == letter):
            j += 1
        end = assign[j][1]
        if letter in _HELIX_CLASS:
            helices.append(Helix(chain=chain, start=start, end=end,
                                 helix_class=_HELIX_CLASS[letter]))
        elif letter == "E":
            strands.append(Strand(chain=chain, start=start, end=end))
        i = j + 1
    return helices, strands


def parse_dssp_output(text: str) -> tuple[list, list]:
    """Helix/Strand records from classic DSSP output."""
    assign = []
    in_table = False
    for line in text.splitlines():
        if line.startswith("  #  RESIDUE"):
            in_table = True
            continue
        if not in_table or len(line) < 17:
            continue
        resseq = line[5:11].strip()  # seq num + insertion code
        chain = line[11].strip() or "-"
        if not resseq:  # chain break line ('!')
            assign.append((None, None, None))
            continue
        ss = line[16]
        assign.append((chain, resseq, ss))
    # keep the '!' break sentinels: a (None, None, None) row splits
    # the run grouping, so two same-letter SSEs separated by an
    # intra-chain break (missing residues) stay TWO SSEs — filtering
    # the sentinel out first would merge them across the gap
    return _runs_to_sses(assign)


def parse_stride_output(text: str) -> tuple[list, list]:
    """Helix/Strand records from STRIDE ASG lines."""
    assign = []
    for line in text.splitlines():
        if not line.startswith("ASG"):
            continue
        parts = line.split()
        # ASG  RES CHAIN RESSEQ ORDINAL SSCODE ...
        chain = parts[2] if parts[2] != "-" else "-"
        resseq = parts[3]
        ss = parts[5]
        assign.append((chain, resseq, ss))
    return _runs_to_sses(assign)


def run_secstruct(pdb_path: str, program: str = "dssp"
                  ) -> tuple[list, list]:
    """(helices, strands) via an external program; raises RuntimeError
    if it is not installed."""
    exe = find_program(program)
    if exe is None:
        raise RuntimeError(
            f"{program} not found on PATH (install mkdssp/stride or use "
            f"the PDB-record mode)")
    out = subprocess.run([exe, pdb_path], capture_output=True, text=True,
                         check=True)
    if program == "dssp":
        return parse_dssp_output(out.stdout)
    return parse_stride_output(out.stdout)


def read_pdb_with_secstruct(path: str, program: str = "pdb",
                            pdbid: str | None = None) -> PDBStructure:
    """read_pdb, with SSEs replaced by an external program's assignment
    when ``program`` is 'dssp' or 'stride'."""
    struct = read_pdb(path, pdbid=pdbid)
    if program != "pdb":
        helices, strands = run_secstruct(path, program)
        struct.helices = helices
        struct.strands = strands
    return struct
