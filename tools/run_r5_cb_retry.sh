#!/bin/bash
# VQAD comparison retry: the first attempt OOM'd on the dense unbudgeted
# trace (4.2M sample rows x 8 corners x 16-way ST-softmax temps).  Give it
# the same budgeted segmented compaction the latent arm uses (generic
# field path; max_samples caps the evaluated rows).
cd /root/repo
while ! grep -q 'headroom\|queue4 done\|lego_hr' /tmp/r5_runs.status 2>/dev/null; do sleep 60; done
sleep 30
echo "cb_retry start $(date)" >> /tmp/r5_runs.status
timeout 5400 python -m shacira_tpu.apps.train_nerf \
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
