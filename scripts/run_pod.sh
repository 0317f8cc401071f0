#!/usr/bin/env bash
# Multi-host pod run of the 4M-vertex north-star config (BASELINE.json:11).
#
# Run THIS SAME command on every host of a TPU pod slice (e.g. with
# `gcloud compute tpus tpu-vm ssh ... --worker=all --command="..."`).
# On Cloud TPU, jax.distributed.initialize() auto-detects the coordinator,
# process count and process id from the TPU metadata — no arguments needed;
# scripts/pod_solve.py calls it with no args when POD_AUTO=1 (default).
#
# For a non-TPU fabric (or manual bring-up), export:
#   POD_AUTO=0 POD_COORDINATOR=host0:8476 POD_NPROC=<hosts> POD_PID=<this host>
#
# The solve itself is the shard_map halo path validated by
# tests/test_multiprocess.py (2 processes x 4 virtual devices) — the pod
# run changes only the device fabric, not the code path.
set -euo pipefail
cd "$(dirname "$0")/.."

: "${POD_GRID:=2048}"        # 2048x2048 cloth = 4.19M vertices
: "${POD_AUTO:=1}"

exec python scripts/pod_solve.py --grid "$POD_GRID"
