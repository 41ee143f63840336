#!/usr/bin/env bash
# Slurm training launcher — analogue of the reference's
# tools/slurm_train.sh (srun + MMDistributedDataParallel). JAX's Slurm
# cluster plugin auto-detects SLURM_* env inside
# jax.distributed.initialize(), so each task just runs tools/train.py.
#
#   GPUS_PER_NODE is meaningless on TPU; request one task per host:
#   bash tools/slurm_train.sh PARTITION JOB_NAME CONFIG [ARGS]
set -eu
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3 || true
NODES=${NODES:-1}
srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
  --ntasks-per-node=1 --kill-on-bad-exit=1 ${SRUN_ARGS:-} \
  python -u tools/train.py "$CONFIG" "$@"
