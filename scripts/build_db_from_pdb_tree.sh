#!/bin/bash
# Build a size-sorted ASCII tableaux+distmatrix database from a tree of
# PDB/ASTRAL files (the reference's buildtableauxdb.py + convdb2.py -s
# pipeline in one step).
#
# Usage: build_db_from_pdb_tree.sh PDB_ROOT_DIR OUTPUT.ascii
set -euo pipefail
PDBROOT="$1"
OUT="$2"
python -m cuda_satabsearch_tpu.build -s -o "$OUT" "$PDBROOT"
