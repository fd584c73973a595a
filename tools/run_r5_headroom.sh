#!/bin/bash
# Diagnostic arm for the lego quality question: same r5 config but
# budget_headroom 2.0 + min_budget 131072 (no rung flapping) — isolates
# the adaptive-ladder under-provisioning hypothesis vs r2c's fixed-budget
# 24.19.  Run AFTER the main queue completes.
set -x
cd /root/repo
timeout 3600 python -m shacira_tpu.apps.train_nerf \
  --config configs/nerf_lego.yaml \
  --dataset-path /tmp/nerf_lego \
  --exp-name lego_r5_hr --log-dir runs/lego_r5_hr \
  --hash-layout paged --mip 0 --seed 1 \
  --segment-size 16 --coarse-level 7 --seg-dilation 2 \
  --seg-budget 32768 --eval-seg-budget 24576 --max-samples 262144 \
  --fine-mode deferred --term-tau 11.5 --lean-stage1 true \
  --adaptive-budget true --min-budget 131072 --budget-headroom 2.0 \
  --valid-every 50 --save-every 50 --log-every 20 \
  > /tmp/lego_r5_hr.log 2>&1
echo "lego_hr rc=$? $(date)" >> /tmp/r5_runs.status
