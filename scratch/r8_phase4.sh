#!/bin/bash
# Round-5 phase-4 CPU queue: TRAINING LENGTH x the robust recipe.
# Phase-2 measured that extending the control 500->1500 steps halves
# best-ckpt jitter (2.08+-0.07 -> 0.985 px) — the largest quality
# lever in the matrix.  Phase-4 asks the two follow-ups that finding
# makes urgent:
#   1. Do the OPEN failure-mode rows (shake x2 amplitude, occluders)
#      move with step budget?  fm sweep on the extended control, then
#      extend hard+mean_matched (the robust recipe) to 1500 and
#      re-sweep — fm_hmmext vs fm_hmm is the budget axis at fixed
#      recipe, fm_hmmext vs fm_l1ext is the recipe axis at fixed
#      budget.
#   2. Does the stacked recipe keep its multi-scale edge at 3x the
#      budget?  Extend the stack arm (seed 0) to 1500 and re-run the
#      paired scoring vs the extended hard_mm — matched 1500-vs-1500.
# Same conventions as the other r8 queues: done-markers, serial,
# nice 5, one lever (here: steps) changed per comparison.
cd /root/repo || exit 1
LOGD=scratch/runs/r8_logs
mkdir -p "$LOGD"
J="$LOGD/queue.log"
note() { echo "[r8p4] $(date -u '+%F %T') $*" >> "$J"; }

CPU_ENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:$PYTHONPATH"

# anchor on the [r8p3] prefix so our own notes can never self-match
note "waiting for phase-3 completion"
until grep -Eq "^\[r8p3\] .* PHASE3 COMPLETE$" "$J"; do sleep 120; done
note "phase 4 begins"

run() {
  local name=$1 t=$2; shift 2
  if [ -f "$LOGD/$name.done" ]; then note "SKIP $name (done)"; return; fi
  note "START $name"
  timeout "$t" nice -n 5 $CPU_ENV python -u "$@" > "$LOGD/$name.log" 2>&1
  local rc=$?
  note "END $name rc=$rc"
  [ $rc -eq 0 ] && touch "$LOGD/$name.done"
}

# cheap first: failure-mode sweep on the ALREADY-extended control
# (r8_l1 best is now step 1300) — budget axis for the base recipe
run fm_l1ext    2400 scratch/r8_failure_modes.py scratch/runs/r8_l1 l1ext

# robust recipe extended to the same budget + its sweep
run arm_hmmext  9000 scratch/r8_run_arm.py scratch/runs/r8_data_hard scratch/runs/r8_hard_mm mm 1500 0
run fm_hmmext   2400 scratch/r8_failure_modes.py scratch/runs/r8_hard_mm hmmext

# stacked recipe extended (seed 0) + sweep + matched-budget pairing
run arm_stackext 9000 scratch/r8_run_stack_arm.py scratch/runs/r8_data_stack scratch/runs/r8_stack 1500 0
run fm_stackext  2400 scratch/r8_failure_modes.py scratch/runs/r8_stack stackext
run score_stackext 2400 scratch/r8_score_ms.py scratch/runs/r8_stack scratch/runs/r8_hard_mm stackext hmmext

note "PHASE4 COMPLETE"
