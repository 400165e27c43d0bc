#!/bin/bash
# SLURM wrapper: query-list search on a TPU node (the L5 layer of the
# reference: gpu.run.cudasatabsearch.querylist.slurm_sript.sh).
#
# Usage: sbatch tpu_satabsearch_querylist.slurm.sh DBFILE QUERYLIST [RESTARTS]
#
# Cluster-level parallelism is unchanged from the reference: independent
# jobs per query list, results concatenated downstream.  Within a job,
# the framework itself scales over all chips of the node (--mesh shards
# the DB entry axis across the local device mesh).
#SBATCH --job-name=tpusatab
#SBATCH --time=0-4:0:00
#SBATCH --output=tpusatab-%j.out
#SBATCH --error=tpusatab-%j.err

set -euo pipefail
DBFILE="$1"
QUERYLIST="$2"
RESTARTS="${3:-8192}"
REPO="${TPUSATAB_REPO:-$(dirname "$0")/..}"

time python -m cuda_satabsearch_tpu -q "$DBFILE" -r "$RESTARTS" --mesh \
    < "$QUERYLIST"
