#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
bash scratch/tpu_run.sh 1400 bench.py
echo "BENCH_RC=$?"
sleep 10
python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN OK')"
echo "DRYRUN_RC=$?"
sleep 10
bash scratch/tpu_run.sh 500 -m pwstablenet_tpu.cli stabilize --synthetic --frames 30 --height 480 --width 832 --output /tmp/final_stab.avi
echo "CLI_RC=$?"
