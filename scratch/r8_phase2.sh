#!/bin/bash
# Round-5 phase-2 CPU queue: waits for the main r8 matrix (r8_cpu_queue.sh)
# to journal ALL DONE, then runs the follow-on experiments serially:
#   1. multi-scale CPU analog (VERDICT item 5): data + arm + paired scoring
#      (score BEFORE the control is extended, so ms-vs-l1 is 500 vs 500)
#   2. control extended 500 -> 1500 steps (champion-2500 CPU analog:
#      does quality keep rising?)  NOTE: the lr schedule is recomputed
#      for 1500 steps on resume (constant to 750 then decay) — a
#      continuation, not a bit-pure extension.
#   3. gradient pixel-loss arm + failure-mode sweep (completes the
#      l1 / mean_matched / gradient triple of C11).
# Same conventions as r8_cpu_queue.sh: done-markers, serial, nice 5.
cd /root/repo || exit 1
LOGD=scratch/runs/r8_logs
mkdir -p "$LOGD"
J="$LOGD/queue.log"
note() { echo "[r8p2] $(date -u '+%F %T') $*" >> "$J"; }

CPU_ENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:$PYTHONPATH"

# NB: the waited-for text must never appear in our own notes (a
# first version journaled "waiting for ... ALL DONE" and matched
# itself); anchor on the MAIN queue's [r8] prefix.
note "waiting for main queue completion"
until grep -q "^\[r8\] .* ALL DONE$" "$J"; do sleep 120; done
note "phase 2 begins"

run() {
  local name=$1 t=$2; shift 2
  if [ -f "$LOGD/$name.done" ]; then note "SKIP $name (done)"; return; fi
  note "START $name"
  timeout "$t" nice -n 5 $CPU_ENV python -u "$@" > "$LOGD/$name.log" 2>&1
  local rc=$?
  note "END $name rc=$rc"
  [ $rc -eq 0 ] && touch "$LOGD/$name.done"
}

run gen_ms    3600 scratch/r8_gen_ms_data.py scratch/runs/r8_data_ms
run arm_ms    5400 scratch/r8_run_ms_arm.py scratch/runs/r8_data_ms scratch/runs/r8_ms 500 0
run score_ms  2400 scratch/r8_score_ms.py scratch/runs/r8_ms scratch/runs/r8_l1
run arm_l1ext 6600 scratch/r8_run_arm.py scratch/runs/r8_data_base scratch/runs/r8_l1 l1 1500 0
run arm_grad  4200 scratch/r8_run_arm.py scratch/runs/r8_data_base scratch/runs/r8_grad grad 500 0
run fm_grad   2400 scratch/r8_failure_modes.py scratch/runs/r8_grad grad

note "PHASE2 ALL DONE"
