#!/bin/bash
# Round-4 artifact matrix, serialized (ONE TPU client at a time).
# Stage gating: pearl bisect -> pearl run; then sweeps and full runs.
set -x
cd /root/repo

# 0a. pearl crash bisect: pearl grid on a small image
timeout 1200 python tools/probe_pearl.py 1 > /tmp/pearl_bisect1.log 2>&1
echo "bisect1 rc=$?"
# 0b. pearl grid on the full 67-Mpix image
timeout 1800 python tools/probe_pearl.py 2 > /tmp/pearl_bisect2.log 2>&1
echo "bisect2 rc=$?"

# 1. pearl end-to-end (only if bisect passed; rerun judgement manual)
timeout 7200 python -m shacira_tpu.apps.train_image \
  --config configs/pearl.yaml \
  --dataset-path /tmp/pearl_img \
  --exp-name pearl_r4 --log-dir runs/pearl_r4 \
  --log-every 1 \
  > /tmp/pearl_r4.log 2>&1
echo "pearl rc=$?"

# 2. R-D sweep: 4 images x 2 seeds x 4 lambdas
timeout 14400 python tools/run_rd_sweep.py --images 4 --seeds 2 \
  > /tmp/rd_sweep_r4.log 2>&1
echo "rd rc=$?"
