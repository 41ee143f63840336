#!/usr/bin/env bash
# Multi-host training launcher — the TPU analogue of the reference's
# tools/dist_train.sh (torch.distributed.launch over GPUS per node,
# ref /root/reference/tools/dist_train.sh:10-19).
#
# TPU pods have no torchrun: EVERY host runs the SAME command and
# jax.distributed.initialize() discovers its peers from the TPU pod
# metadata (tools/train.py calls engine.init_distributed(), which
# no-ops single-host). Typical pod launch:
#
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
#     --command "cd /path/to/repo && bash tools/dist_train.sh CONFIG [ARGS]"
#
# Off-pod (dev box / CI): NPROCS=k spawns k local processes that
# rendezvous on a localhost coordinator — the JAX equivalent of the
# reference's single-node multi-GPU mode. Each process sees its own
# devices (on CPU, pass through XLA_FLAGS for virtual devices).
#
#   NPROCS=2 PORT=12399 bash tools/dist_train.sh CONFIG [ARGS]
set -eu
CONFIG=$1
shift || true

# resolve the entry against the repo this script lives in, so the
# launcher works from any CWD (gcloud ssh lands in $HOME)
REPO_ROOT=$(cd "$(dirname "$0")/.." && pwd)
ENTRY=${DIST_ENTRY:-$REPO_ROOT/tools/train.py}
if [ "${NPROCS:-1}" -gt 1 ]; then
  PORT=${PORT:-12355}
  # generous coordination margins: compile-heavy rendezvous on a loaded
  # host can starve the 100 s default heartbeat (engine init_distributed
  # forwards these)
  export JAX_HEARTBEAT_TIMEOUT_SECONDS=${JAX_HEARTBEAT_TIMEOUT_SECONDS:-900}
  export JAX_INIT_TIMEOUT_SECONDS=${JAX_INIT_TIMEOUT_SECONDS:-900}
  pids=()
  for i in $(seq 0 $((NPROCS - 1))); do
    JAX_COORDINATOR_ADDRESS=127.0.0.1:$PORT \
    JAX_NUM_PROCESSES=$NPROCS \
    JAX_PROCESS_ID=$i \
      python "$ENTRY" "$CONFIG" "$@" &
    pids+=($!)
  done
  rc=0
  for p in "${pids[@]}"; do wait "$p" || rc=$?; done
  exit $rc
else
  exec python "$ENTRY" "$CONFIG" "$@"
fi
