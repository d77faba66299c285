#!/usr/bin/env bash
# Submit a sharded phylign-tpu run to LSF (the reference's cluster_lsf analog:
# /root/reference/Makefile:126-131, scripts/submit_lsf.sh).
#
# usage: scripts/cluster_lsf.sh <num_tasks> <phase: match|map|all> [queries...]
set -euo pipefail
NUM="${1:?num_tasks}"
PHASE="${2:?phase}"
shift 2
# reference-parity precheck: abort before submitting if the config has
# auto-scaled knobs (check_if_config_is_ok_for_cluster_run.py analog)
python -m phylign_tpu.cli check-cluster
bsub -J "phylign[1-${NUM}]" \
  "python -m phylign_tpu.cli ${PHASE} --num-processes ${NUM} \
   --process-id \$((LSB_JOBINDEX - 1)) $*"
