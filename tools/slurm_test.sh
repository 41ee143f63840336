#!/usr/bin/env bash
# Slurm evaluation launcher — analogue of the reference's
# tools/slurm_test.sh. See slurm_train.sh for the launch model.
#   bash tools/slurm_test.sh PARTITION JOB_NAME CONFIG CKPT [ARGS]
set -eu
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3 || true
NODES=${NODES:-1}
srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
  --ntasks-per-node=1 --kill-on-bad-exit=1 ${SRUN_ARGS:-} \
  python -u tools/test.py "$CONFIG" "$@"
