#!/bin/bash
# Round-5 serial CPU experiment queue (VERDICT item 1, dead-tunnel
# branch): the ranked A/B matrix at the measured CPU envelope
# (64^2 lvl6 base32 bs4, ~4.2 s/step on the 1-core host).  Runs one
# job at a time — the host has ONE core; parallel arms would just
# timeslice.  Done-markers make the queue re-runnable after a crash;
# training arms resume from their own checkpoints.
# Logs: scratch/runs/r8_logs/<name>.log, journal in queue.log.
cd /root/repo || exit 1
LOGD=scratch/runs/r8_logs
mkdir -p "$LOGD"
J="$LOGD/queue.log"
note() { echo "[r8] $(date -u '+%F %T') $*" >> "$J"; }

CPU_ENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:$PYTHONPATH"

run() {
  local name=$1 t=$2; shift 2
  if [ -f "$LOGD/$name.done" ]; then note "SKIP $name (done)"; return; fi
  note "START $name"
  timeout "$t" nice -n 5 $CPU_ENV python -u "$@" > "$LOGD/$name.log" 2>&1
  local rc=$?
  note "END $name rc=$rc"
  [ $rc -eq 0 ] && touch "$LOGD/$name.done"
}

STEPS=${R8_STEPS:-500}

# 1. data (same scene seeds; stressor draws differ)
run gen_base 2400 scratch/r8_gen_cpu_data.py scratch/runs/r8_data_base base
run gen_hard 2400 scratch/r8_gen_cpu_data.py scratch/runs/r8_data_hard hard

# 2. control + pixel-loss A/B on base data
run arm_l1   4200 scratch/r8_run_arm.py scratch/runs/r8_data_base scratch/runs/r8_l1 l1 "$STEPS" 0
run fm_l1    2400 scratch/r8_failure_modes.py scratch/runs/r8_l1 l1
run arm_mm   4200 scratch/r8_run_arm.py scratch/runs/r8_data_base scratch/runs/r8_mm mm "$STEPS" 0
run fm_mm    2400 scratch/r8_failure_modes.py scratch/runs/r8_mm mm

# 3. curriculum-vs-not (hard data), both pixel losses
run arm_hl1  4200 scratch/r8_run_arm.py scratch/runs/r8_data_hard scratch/runs/r8_hard_l1 l1 "$STEPS" 0
run fm_hl1   2400 scratch/r8_failure_modes.py scratch/runs/r8_hard_l1 hard_l1
run arm_hmm  4200 scratch/r8_run_arm.py scratch/runs/r8_data_hard scratch/runs/r8_hard_mm mm "$STEPS" 0
run fm_hmm   2400 scratch/r8_failure_modes.py scratch/runs/r8_hard_mm hard_mm

# 4. w_feature ablation (C12, third round open) on base data
run arm_wf0  4200 scratch/r8_run_arm.py scratch/runs/r8_data_base scratch/runs/r8_wf_off wf_off "$STEPS" 0
run arm_wfv  4200 scratch/r8_run_arm.py scratch/runs/r8_data_base scratch/runs/r8_wf_vgg wf_vgg "$STEPS" 0

# 5. seed spread on the control (is one seed's delta meaningful?)
run arm_l1s1 4200 scratch/r8_run_arm.py scratch/runs/r8_data_base scratch/runs/r8_l1_s1 l1 "$STEPS" 1
run arm_l1s2 4200 scratch/r8_run_arm.py scratch/runs/r8_data_base scratch/runs/r8_l1_s2 l1 "$STEPS" 2

note "ALL DONE"
