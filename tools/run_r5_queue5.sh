#!/bin/bash
# Final TPU slot: reduced-geometry VQAD comparison arm.  The reference
# nerf_codebook.yaml geometry (base_lod 5, 4 LODs -> dense octree at
# lod 8) exceeds 16 GB HBM with the dense-sample design (two OOMs
# recorded); base_lod 4 / 3 LODs keeps the same ST-softmax machinery at
# a quarter the table and fits.
cd /root/repo
while ! grep -q 'lego_hr rc=' /tmp/r5_runs.status 2>/dev/null; do sleep 60; done
sleep 30
echo "queue5 start $(date)" >> /tmp/r5_runs.status
timeout 3000 python -m shacira_tpu.apps.train_nerf \
  --config configs/nerf_codebook.yaml \
  --dataset-path /tmp/nerf_lego \
  --exp-name cb_r5 --log-dir runs/cb_r5 \
  --mip 1 --epochs 50 --prune-every -1 \
  --base-lod 4 --num-lods 3 \
  --segment-size 16 --coarse-level 5 --seg-dilation 2 \
  --seg-budget 16384 --max-samples 131072 \
  --log-every 10 --metrics-only \
  > /tmp/cb_r5.log 2>&1
echo "codebook_small rc=$? $(date)" >> /tmp/r5_runs.status

sleep 60   # relay settle between clients
timeout 2700 python -m shacira_tpu.apps.train_nerf \
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
echo "latent50_final rc=$? $(date)" >> /tmp/r5_runs.status
