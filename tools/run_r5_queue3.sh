#!/bin/bash
# Stage-3 TPU queue: sustained super-cull measure, paged dense lean A/B,
# then the full-length runs (lego seeds + V8) and the backbone comparison.
cd /root/repo
while ! grep -q 'sust_lean_g32' /tmp/r5_queue.status 2>/dev/null; do sleep 30; done
sleep 30
echo "queue3 start $(date)" >> /tmp/r5_queue.status

timeout 3000 python bench_nerf.py --pruned --iters 200 --term-tau 11.5 \
  --super 4 > /tmp/bench_sust_super.log 2>&1
echo "sust_super rc=$? $(date)" >> /tmp/r5_queue.status

timeout 2400 python bench_nerf.py --paged --iters 60 --lean \
  > /tmp/bench_dense_paged_lean.log 2>&1
echo "dense_paged_lean rc=$? $(date)" >> /tmp/r5_queue.status

bash tools/run_r5_runs.sh 1
echo "runs done $(date)" >> /tmp/r5_queue.status

bash tools/run_r5_compare.sh
echo "compare done $(date)" >> /tmp/r5_queue.status
