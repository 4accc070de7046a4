#!/bin/bash
# Round-5 phase-3 CPU queue (capstone): the STACKED robust recipe.
# The matrix measured each lever alone; this phase measures all three
# measured-positive levers combined — hard curriculum data + mean_matched
# pixel loss + multi-scale (2x data + downscale jitter) — with a seed
# replicate, scored (a) on the standard failure-mode sweep (comparable
# row-for-row with fm_l1/fm_mm/fm_hl1/fm_hmm) and (b) PAIRED against
# r8_hard_mm, from which it differs by exactly the multi-scale lever.
# Same conventions as r8_cpu_queue.sh: done-markers, serial, nice 5.
cd /root/repo || exit 1
LOGD=scratch/runs/r8_logs
mkdir -p "$LOGD"
J="$LOGD/queue.log"
note() { echo "[r8p3] $(date -u '+%F %T') $*" >> "$J"; }

CPU_ENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:$PYTHONPATH"

# wait for phase 2 (anchor on the [r8p2] prefix so our own notes can
# never self-match; see the r8_phase2.sh self-match gotcha)
note "waiting for phase-2 completion"
until grep -Eq "^\[r8p2\] .* ALL DONE$" "$J"; do sleep 120; done
note "phase 3 begins"

run() {
  local name=$1 t=$2; shift 2
  if [ -f "$LOGD/$name.done" ]; then note "SKIP $name (done)"; return; fi
  note "START $name"
  timeout "$t" nice -n 5 $CPU_ENV python -u "$@" > "$LOGD/$name.log" 2>&1
  local rc=$?
  note "END $name rc=$rc"
  [ $rc -eq 0 ] && touch "$LOGD/$name.done"
}

run gen_stack   3600 scratch/r8_gen_stack_data.py scratch/runs/r8_data_stack
run arm_stack   5400 scratch/r8_run_stack_arm.py scratch/runs/r8_data_stack scratch/runs/r8_stack 500 0
run fm_stack    2400 scratch/r8_failure_modes.py scratch/runs/r8_stack stack
run score_stack 2400 scratch/r8_score_ms.py scratch/runs/r8_stack scratch/runs/r8_hard_mm stack hard_mm
run arm_stack1  5400 scratch/r8_run_stack_arm.py scratch/runs/r8_data_stack scratch/runs/r8_stack_s1 500 1
run fm_stack1   2400 scratch/r8_failure_modes.py scratch/runs/r8_stack_s1 stack_s1
run score_stack1 2400 scratch/r8_score_ms.py scratch/runs/r8_stack_s1 scratch/runs/r8_hard_mm stack_s1 hard_mm

note "PHASE3 COMPLETE"
