#!/bin/bash
# Stage-4 TPU queue (post-compare): first REAL-TPU run of the fused voxel
# path (landed in the r4 end-of-round snapshot, CPU-tested only), then
# the budget-headroom quality diagnostic.
cd /root/repo
while ! grep -q 'compare done' /tmp/r5_runs.status 2>/dev/null; do sleep 60; done
sleep 30
echo "queue4 start $(date)" >> /tmp/r5_runs.status

timeout 3000 python bench_nerf.py --voxel --paged --term-tau 11.5 --iters 200 \
  > /tmp/bench_voxel_r5.log 2>&1
echo "voxel rc=$? $(date)" >> /tmp/r5_runs.status

bash tools/run_r5_headroom.sh
echo "queue4 done $(date)" >> /tmp/r5_runs.status
