#!/bin/bash
# Serial CPU data-generation chain (1-core host): wait for the r6
# multi-scale dataset generator (already running) to finish, then
# generate the r7 curriculum dataset. Logs to /tmp/r7_gen_chain.log.
cd /root/repo || exit 1
R6_PID=$(cat /tmp/r6_gen.pid 2>/dev/null)
if [ -n "$R6_PID" ]; then
  while kill -0 "$R6_PID" 2>/dev/null; do sleep 60; done
fi
echo "r6 generation finished $(date -u)"
# validate/complete the r6 set (resume-capable; no-op if all 61 good)
nice -n 10 env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  python -u scratch/r6_gen_data_resume.py scratch/runs/r6_data
echo "r6 validated $(date -u)"
nice -n 10 env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  python -u scratch/r7_gen_curriculum_data.py scratch/runs/r7_data
echo "r7 curriculum done $(date -u)"
