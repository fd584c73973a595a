#!/bin/bash
# Round-4 full end-to-end runs, serialized (ONE TPU client at a time).
# lego with transmittance culling (quality-neutrality evidence vs
# lego_r2c's 24.19 dB), then the V8 voxel config with the restored
# prune_every + term culling.
set -x
cd /root/repo

timeout 14400 python -m shacira_tpu.apps.train_nerf \
  --config configs/nerf_lego.yaml \
  --dataset-path /tmp/nerf_lego \
  --exp-name lego_r4 --log-dir runs/lego_r4 \
  --hash-layout paged --mip 0 \
  --segment-size 16 --coarse-level 7 --seg-dilation 2 \
  --seg-budget 32768 --eval-seg-budget 24576 --max-samples 262144 \
  --fine-mode deferred --term-tau 11.5 \
  --adaptive-budget true --min-budget 8192 \
  --valid-every 25 --save-every 25 --log-every 20 \
  > /tmp/lego_r4.log 2>&1
echo "lego rc=$?" >> /tmp/r4_runs.status

timeout 10800 python -m shacira_tpu.apps.train_nerf \
  --config configs/nerf_V8.yaml \
  --dataset-path /tmp/rtmv_v8 \
  --exp-name v8_r4 --log-dir runs/v8_r4 \
  --hash-layout paged --mip 0 \
  --max-intersections 64 --max-samples 262144 --eval-seg-budget 16384 \
  --term-tau 11.5 --adaptive-budget true --min-budget 8192 \
  --log-every 20 \
  > /tmp/v8_r4.log 2>&1
echo "v8 rc=$?" >> /tmp/r4_runs.status
