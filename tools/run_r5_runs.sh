#!/bin/bash
# Round-5 full end-to-end runs, serialized (ONE TPU client at a time).
# Usage: run_r5_runs.sh [LEAN]  — LEAN=1 adds --lean-stage1 to lego runs.
# 1) lego seeds 1,2 at the r4/r5 configuration (quality-spread evidence vs
#    r2c's 24.19 — VERDICT item 5), 2) V8 rerun with the corrected
#    reference hyperparameters (VERDICT item 6).
set -x
cd /root/repo
LEAN_FLAG=""
if [ "$1" = "1" ]; then LEAN_FLAG="--lean-stage1 true"; fi

for SEED in 1 2; do
  timeout 7200 python -m shacira_tpu.apps.train_nerf \
    --config configs/nerf_lego.yaml \
    --dataset-path /tmp/nerf_lego \
    --exp-name lego_r5_s$SEED --log-dir runs/lego_r5_s$SEED \
    --hash-layout paged --mip 0 --seed $SEED \
    --segment-size 16 --coarse-level 7 --seg-dilation 2 \
    --seg-budget 32768 --eval-seg-budget 24576 --max-samples 262144 \
    --fine-mode deferred --term-tau 11.5 $LEAN_FLAG \
    --adaptive-budget true --min-budget 8192 \
    --valid-every 50 --save-every 50 --log-every 20 \
    > /tmp/lego_r5_s$SEED.log 2>&1
  echo "lego_s$SEED rc=$? $(date)" >> /tmp/r5_runs.status
done

timeout 7200 python -m shacira_tpu.apps.train_nerf \
  --config configs/nerf_V8.yaml \
  --dataset-path /tmp/rtmv_v8 \
  --exp-name v8_r5 --log-dir runs/v8_r5 \
  --hash-layout paged --mip 0 \
  --max-intersections 64 --max-samples 262144 --eval-seg-budget 16384 \
  --term-tau 11.5 --adaptive-budget true --min-budget 8192 \
  --prune-min-density 0.2 \
  --valid-every 100 --save-every 100 --log-every 20 \
  > /tmp/v8_r5.log 2>&1
echo "v8_r5 rc=$? $(date)" >> /tmp/r5_runs.status
