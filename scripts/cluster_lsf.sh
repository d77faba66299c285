#!/usr/bin/env bash
# Submit a sharded phylign-tpu run to LSF (the reference's cluster_lsf analog:
# /root/reference/Makefile:126-131, scripts/submit_lsf.sh).
#
# usage: scripts/cluster_lsf.sh <num_tasks> <phase: match|map|all> [queries...]
set -euo pipefail
NUM="${1:?num_tasks}"
PHASE="${2:?phase}"
shift 2
bsub -J "phylign[1-${NUM}]" \
  "python -m phylign_tpu.cli ${PHASE} --num-processes ${NUM} \
   --process-id \$((LSB_JOBINDEX - 1)) $*"
