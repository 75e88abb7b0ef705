#!/bin/bash
# Run a python script on the tunneled TPU with retries: the axon claim at
# interpreter startup can wedge if a previous process died mid-session.
# Usage: scripts/tpu_run.sh <timeout_s> <script> [args...]
T="$1"; shift
for attempt in 1 2 3; do
  timeout "$T" python -u "$@" 2>&1 | grep -v "WARNING.*xla_bridge"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 124 ] && [ "$rc" -ne 143 ]; then
    exit "$rc"
  fi
  echo "[tpu_run] attempt $attempt timed out (rc=$rc); retrying in 20s" >&2
  sleep 20
done
exit 124
