#!/bin/bash
# Diagnostic arm for the lego quality question: same r5 config but
# budget_headroom 2.0 + min_budget 131072 (no rung flapping) — isolates
# the adaptive-ladder under-provisioning hypothesis vs r2c's fixed-budget
# 24.19.  Run AFTER the main queue completes.
set -x
cd /root/repo

timeout 4200 python -m shacira_tpu.apps.train_nerf \
  --config configs/nerf_codebook.yaml \
  --dataset-path /tmp/nerf_lego \
  --exp-name cb_r5 --log-dir runs/cb_r5 \
  --mip 1 --epochs 50 --prune-every 100 \
  --segment-size 16 --coarse-level 5 --seg-dilation 2 \
  --seg-budget 16384 --max-samples 131072 \
  --log-every 10 --metrics-only \
  > /tmp/cb_r5.log 2>&1
echo "codebook_retry rc=$? $(date)" >> /tmp/r5_runs.status

timeout 3600 python -m shacira_tpu.apps.train_nerf \
  --config configs/nerf_lego.yaml \
  --dataset-path /tmp/nerf_lego \
  --exp-name latent50_r5 --log-dir runs/latent50_r5 \
  --hash-layout paged --mip 1 --epochs 50 \
  --segment-size 16 --coarse-level 7 --seg-dilation 2 \
  --seg-budget 32768 --eval-seg-budget 24576 --max-samples 262144 \
  --fine-mode deferred --term-tau 11.5 \
  --adaptive-budget true --min-budget 8192 \
  --log-every 10 --metrics-only \
  > /tmp/latent50_r5.log 2>&1
echo "latent50_retry rc=$? $(date)" >> /tmp/r5_runs.status

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
