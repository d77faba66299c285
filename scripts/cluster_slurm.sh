#!/usr/bin/env bash
# Submit a sharded phylign-tpu run to SLURM (shared-filesystem model, the
# reference's cluster_slurm analog: /root/reference/Makefile:118-124).
# Each array task processes every Nth batch; task 0 re-runs `match`/`map`
# at the end to filter/aggregate once all shards are present.
#
# usage: scripts/cluster_slurm.sh <num_tasks> <phase: match|map|all> [queries...]
set -euo pipefail
NUM="${1:?num_tasks}"
PHASE="${2:?phase}"
shift 2
# reference-parity precheck: abort before submitting if the config has
# auto-scaled knobs (check_if_config_is_ok_for_cluster_run.py analog)
python -m phylign_tpu.cli check-cluster
sbatch --array=0-$((NUM - 1)) --wrap="python -m phylign_tpu.cli ${PHASE} \
  --num-processes ${NUM} --process-id \${SLURM_ARRAY_TASK_ID} $*"
