#!/bin/bash
# Driver-round-4 serial TPU experiment queue. Waits for the tunnel to
# come back (the outage began mid-round-3), then runs the VERDICT-ranked
# experiments one at a time (only ONE TPU process may exist at a time).
# Logs: scratch/runs/r7_logs/<name>.log, queue journal in queue.log.
cd /root/repo || exit 1
LOGD=scratch/runs/r7_logs
mkdir -p "$LOGD"
J="$LOGD/queue.log"
note() { echo "[queue] $(date -u '+%F %T') $*" >> "$J"; }

note "waiting for TPU (probe file /tmp/tpu_alive)"
PROBE_PID=$(cat /tmp/tpu_probe.pid 2>/dev/null)
while [ ! -f /tmp/tpu_alive ]; do
  # the standalone probe loop (/tmp/tpu_probe.pid) writes the file and
  # exits on success; if it died without succeeding, probe ourselves
  if [ -z "$PROBE_PID" ] || ! kill -0 "$PROBE_PID" 2>/dev/null; then
    if timeout 45 env JAX_PLATFORMS="" python -c \
       'import jax; d=jax.devices(); assert d[0].platform!="cpu", d' \
       >/dev/null 2>&1; then
      date -u > /tmp/tpu_alive
      break
    fi
  fi
  sleep 120
done
note "TPU ALIVE"

run() {
  local name=$1 t=$2; shift 2
  if [ -f "$LOGD/$name.done" ]; then note "SKIP $name (done)"; return; fi
  note "START $name"
  bash scratch/r7_tpu_run.sh "$t" "$@" > "$LOGD/$name.log" 2>&1
  local rc=$?
  note "END $name rc=$rc"
  [ $rc -eq 0 ] && touch "$LOGD/$name.done"
}

wait_pairs() {  # wait_pairs <root> <n> <frames> — until n COMPLETE pairs
  local root=$1 n=$2 frames=$3
  until python - "$root" "$n" "$frames" <<'PYEOF'
import sys, cv2, os
root, n, frames = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
def full(p):
    if not os.path.exists(p):
        return False
    cap = cv2.VideoCapture(p)
    k = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return k == frames
ok = all(
    full(os.path.join(root, kind, f"{i:02d}.avi"))
    for i in range(n) for kind in ("stable", "unstable")
)
sys.exit(0 if ok else 1)
PYEOF
  do
    note "waiting for data $root ($(ls "$root/unstable/"*.avi 2>/dev/null | wc -l)/$n)"
    sleep 180
  done
}

# 1. conv reformulation probes (VERDICT item 7) — minutes
run convprobe 900 scratch/r7_conv_probe.py
run deconvprobe 1200 scratch/r7_deconv_probe.py
run phasestep 1800 scratch/r7_phase_step_probe.py

# 2. full bench incl. new default-config DP step (items 1+8)
run bench 3600 bench.py

# 3. champion-v2: resume 1000 -> 2500 steps (item 2a)
run champion25 10800 scratch/r5_train_champion.py scratch/runs/r5_data scratch/runs/r5_champion 2500 0
run champ25_score 7200 scratch/r5_score_benchres.py scratch/runs/r5_champion scratch/runs/r7_champ25_score all
run champ25_fm 5400 scratch/r5_failure_modes.py scratch/runs/r5_champion

# 4. curriculum-hardened arms (items 3+4) — need r7_data
wait_pairs scratch/runs/r7_data 61 64
run hard_l1 10800 scratch/r7_train_hardened.py scratch/runs/r7_data scratch/runs/r7_hard_l1 1000 0 l1
run fm_l1 5400 scratch/r5_failure_modes.py scratch/runs/r7_hard_l1
run hard_mm 10800 scratch/r7_train_hardened.py scratch/runs/r7_data scratch/runs/r7_hard_mm 1000 0 mean_matched
run fm_mm 5400 scratch/r5_failure_modes.py scratch/runs/r7_hard_mm

# 5. multi-scale recipe (item 2b) — r6_data generation finishes first
wait_pairs scratch/runs/r6_data 61 80
run multiscale 10800 scratch/r6_train_multiscale.py scratch/runs/r6_data scratch/runs/r6_multiscale 1000 0
run ms_score 7200 scratch/r5_score_benchres.py scratch/runs/r6_multiscale scratch/runs/r7_ms_score all

# 6. w_feature ablation (item 5), 3 arms on the round-5 data
run wfeat_off 10800 scratch/r7_wfeature_ablation.py scratch/runs/r5_data scratch/runs/r7_wf_off off 1000 0
run wfeat_def 10800 scratch/r7_wfeature_ablation.py scratch/runs/r5_data scratch/runs/r7_wf_def default 1000 0
run wfeat_vgg 10800 scratch/r7_wfeature_ablation.py scratch/runs/r5_data scratch/runs/r7_wf_vgg vgg_width 1000 0

# 7. 3-seed high-pan null confirmation (item 9) — cheapest-value last
for seed in 1 2; do
  for arm in raw compensated; do
    run "hp_${arm}_s${seed}" 10800 scratch/r5_highpan_ab.py scratch/runs/r5_highpan "$arm" "$seed" 600
  done
done

note "ALL DONE"
