#!/bin/bash
# Stage-2 TPU experiments: sustained lean A/B + G=32 culling segments.
cd /root/repo
while ! grep -q 'dense_lean' /tmp/r5_queue.status 2>/dev/null; do sleep 30; done
sleep 30
echo "queue2 start $(date)" >> /tmp/r5_queue.status

timeout 3000 python bench_nerf.py --pruned --iters 200 --term-tau 11.5 --lean \
  > /tmp/bench_sust_lean.log 2>&1
echo "sust_lean rc=$? $(date)" >> /tmp/r5_queue.status

timeout 3000 python bench_nerf.py --pruned --iters 200 --term-tau 11.5 --lean \
  --seg-size 32 > /tmp/bench_sust_lean_g32.log 2>&1
echo "sust_lean_g32 rc=$? $(date)" >> /tmp/r5_queue.status
