#!/bin/bash
# Grid-backbone TPU comparison row (VERDICT item 3 "done" criterion):
# CodebookOctreeGrid (VQAD, reference nerf_codebook.yaml geometry) vs
# LatentGrid (SHACIRA lego config) on the same lego-class scene, same
# 50-epoch budget, same eval protocol.  Serialized TPU use.
set -x
cd /root/repo

timeout 5400 python -m shacira_tpu.apps.train_nerf \
  --config configs/nerf_codebook.yaml \
  --dataset-path /tmp/nerf_lego \
  --exp-name cb_r5 --log-dir runs/cb_r5 \
  --mip 1 --epochs 50 --prune-every 100 \
  --log-every 10 --metrics-only \
  > /tmp/cb_r5.log 2>&1
echo "codebook rc=$? $(date)" >> /tmp/r5_runs.status

timeout 5400 python -m shacira_tpu.apps.train_nerf \
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
echo "latent50 rc=$? $(date)" >> /tmp/r5_runs.status
