"""Collect the round-5 CPU-envelope A/B matrix into comparison tables.

Parses scratch/runs/r8_logs/{arm_*,fm_*}.log:
  - eval-hook trajectory (JSON lines containing "eval_stability")
  - final fresh-clip EVAL[ema]/EVAL[best] reports
  - failure-mode rows FAIL[tag][variant]

Usage: python scratch/r8_collect.py [logdir]
"""
import glob
import json
import os
import re
import sys

logd = sys.argv[1] if len(sys.argv) > 1 else "scratch/runs/r8_logs"

print("== eval-hook trajectories (held-out clip stability) ==")
for path in sorted(glob.glob(os.path.join(logd, "arm_*.log"))):
    name = os.path.basename(path)[4:-4]
    traj, final, best = [], {}, None
    for line in open(path):
        line = line.strip()
        if '"eval_stability"' in line and line.startswith("{"):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            traj.append((d.get("step"), d.get("eval_stability")))
        m = re.match(r"EVAL\[(\w+)\] (\{.*\})", line)
        if m:
            final[m.group(1)] = json.loads(m.group(2))
        if line.startswith("best:"):
            best = line[5:].strip()
    tr = " ".join(
        f"{s}:{v:.3f}" for s, v in traj if s is not None and v is not None
    )
    print(f"{name:12s} traj[{tr}]")
    for label, d in final.items():
        keys = (
            "stability_score", "original_stability_score", "jitter_rms_px",
            "original_jitter_rms_px", "psnr_vs_gt",
        )
        row = " ".join(f"{k}={d[k]}" for k in keys if k in d)
        print(f"{'':12s} EVAL[{label}] {row}")
    if best:
        print(f"{'':12s} best {best}")

print("\n== failure-mode sweeps ==")
rows = {}
variants = []
for path in sorted(glob.glob(os.path.join(logd, "fm_*.log"))):
    for line in open(path):
        m = re.match(r"FAIL\[([^\]]+)\]\[([^\]]+)\] (\{.*\})", line.strip())
        if m:
            tag, var, d = m.group(1), m.group(2), json.loads(m.group(3))
            rows[(tag, var)] = d
            if var not in variants:
                variants.append(var)
tags = sorted({t for t, _ in rows})
for var in variants:
    print(f"\n-- {var} --")
    for tag in tags:
        d = rows.get((tag, var))
        if not d:
            continue
        print(
            f"  {tag:10s} stab={d.get('stability_score')} "
            f"jit={d.get('jitter_rms_px')} "
            f"(unstable {d.get('original_jitter_rms_px')}) "
            f"psnr={d.get('psnr_vs_gt')} dist={d.get('distortion_value')}"
        )
