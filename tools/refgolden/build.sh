#!/bin/sh
# Build the reference CPU oracle (`refhost`) out-of-tree.
#
# Compiles the UNMODIFIED reference sources
#   cudaSaTabsearch_kernel.cu   (host path: plain C++ when CUDA undefined,
#                                reference kernel.cu:53-65)
#   parsetableaux.c, gumbelstats.c   (plain C)
# against the two-struct driver_types.h stub in this directory, plus our own
# minimal driver (ref_host_main.cpp).  Output binary: $OUT (default
# /tmp/refgolden/refhost).  The reference checkout is never written to.
set -e
REF=${REF:-/root/reference/nvcc_src_current}
HERE=$(cd "$(dirname "$0")" && pwd)
OUTDIR=${OUTDIR:-/tmp/refgolden}
OUT=$OUTDIR/refhost
mkdir -p "$OUTDIR"

CXX=${CXX:-g++}
FLAGS="-O2 -I$HERE -I$REF -w $CPPFLAGS"

$CXX $FLAGS -x c++ -c "$REF/cudaSaTabsearch_kernel.cu" -o "$OUTDIR/kernel.o"
$CXX $FLAGS -x c++ -c "$REF/parsetableaux.c" -o "$OUTDIR/parsetableaux.o"
$CXX $FLAGS -x c++ -c "$REF/gumbelstats.c" -o "$OUTDIR/gumbelstats.o"
$CXX $FLAGS -c "$HERE/ref_host_main.cpp" -o "$OUTDIR/main.o"
$CXX $FLAGS "$OUTDIR/main.o" "$OUTDIR/kernel.o" "$OUTDIR/parsetableaux.o" \
    "$OUTDIR/gumbelstats.o" -lm -o "$OUT"
echo "$OUT"
