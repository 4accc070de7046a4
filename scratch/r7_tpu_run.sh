#!/bin/bash
# Run a python script on the TPU with retry (chip grant is flaky right
# after a previous process exits; training scripts resume their own
# checkpoints so a timeout retry CONTINUES, not restarts).
# Usage: r7_tpu_run.sh <timeout_s> <script> [args]
T=$1; shift
for attempt in 1 2 3; do
  timeout "$T" python -u "$@" 2>&1 \
    | grep --line-buffered -vE "WARNING:|axon_terminal|axon_host|Source Location"
  code=${PIPESTATUS[0]}
  if [ $code -ne 124 ] && [ $code -ne 143 ]; then exit $code; fi
  echo "[tpu_run] attempt $attempt timed out (code $code); sleeping 15s"
  sleep 15
done
exit 1
