#!/bin/bash
# Run a python script on the TPU with retry (chip grant is flaky right
# after a previous process exits). Usage: tpu_run.sh <timeout_s> <script> [args]
T=$1; shift
for attempt in 1 2 3; do
  timeout "$T" python "$@" 2>&1 | grep -vE "WARNING:|axon_terminal|axon_host|Source Location" 
  code=${PIPESTATUS[0]}
  if [ $code -ne 124 ] && [ $code -ne 143 ]; then exit $code; fi
  echo "[tpu_run] attempt $attempt timed out (code $code); sleeping 10s"
  sleep 10
done
exit 1
