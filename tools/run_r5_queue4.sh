#!/bin/bash
# Stage-4 TPU queue (post-compare): resume the relay-stalled s2 run, rerun
# V8 WITHOUT pruning (the r3 protocol — the synthetic RTMV scene's density
# scale makes any prune threshold cliff the field; isolates the r5 config
# fixes), then the first real-TPU fused-voxel run, then the budget-headroom
# diagnostic.
cd /root/repo
while ! grep -q 'compare done' /tmp/r5_runs.status 2>/dev/null; do sleep 60; done
sleep 30
echo "queue4 start $(date)" >> /tmp/r5_runs.status

timeout 3600 python -m shacira_tpu.apps.train_nerf \
  --config configs/nerf_lego.yaml \
  --dataset-path /tmp/nerf_lego \
  --exp-name lego_r5_s2 --log-dir runs/lego_r5_s2 \
  --hash-layout paged --mip 0 --seed 2 --resume true \
  --segment-size 16 --coarse-level 7 --seg-dilation 2 \
  --seg-budget 32768 --eval-seg-budget 24576 --max-samples 262144 \
  --fine-mode deferred --term-tau 11.5 --lean-stage1 true \
  --adaptive-budget true --min-budget 8192 \
  --valid-every 50 --save-every 50 --log-every 20 \
  >> /tmp/lego_r5_s2.log 2>&1
echo "lego_s2_resume rc=$? $(date)" >> /tmp/r5_runs.status

timeout 5400 python -m shacira_tpu.apps.train_nerf \
  --config configs/nerf_V8.yaml \
  --dataset-path /tmp/rtmv_v8 \
  --exp-name v8_r5 --log-dir runs/v8_r5b \
  --hash-layout paged --mip 0 \
  --max-intersections 64 --max-samples 262144 --eval-seg-budget 16384 \
  --term-tau 11.5 --adaptive-budget true --min-budget 8192 \
  --prune-every -1 \
  --valid-every 100 --save-every 100 --log-every 20 \
  > /tmp/v8_r5b.log 2>&1
echo "v8_r5b rc=$? $(date)" >> /tmp/r5_runs.status

timeout 3000 python bench_nerf.py --voxel --paged --term-tau 11.5 --iters 200 \
  > /tmp/bench_voxel_r5.log 2>&1
echo "voxel rc=$? $(date)" >> /tmp/r5_runs.status

bash tools/run_r5_headroom.sh
echo "queue4 done $(date)" >> /tmp/r5_runs.status
