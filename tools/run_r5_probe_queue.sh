#!/bin/bash
# Post-pearl TPU queue (ONE client at a time): steady-state breakdown
# probe, then dense lean-stage1 A/B.
cd /root/repo
# wait for the pearl client to fully exit
while pgrep -f 'apps.train_image' > /dev/null; do sleep 30; done
sleep 45   # relay settle
echo "queue start $(date)" >> /tmp/r5_queue.status

timeout 4800 python tools/probe_steady.py --warmup 1200 --iters 100 \
  --out /tmp/probe_steady.json > /tmp/probe_steady.log 2>&1
echo "probe_steady rc=$? $(date)" >> /tmp/r5_queue.status

timeout 2400 python bench_nerf.py --iters 60 --term-tau 11.5 \
  > /tmp/bench_dense_base.log 2>&1
echo "dense_base rc=$? $(date)" >> /tmp/r5_queue.status

timeout 2400 python bench_nerf.py --iters 60 --term-tau 11.5 --lean \
  > /tmp/bench_dense_lean.log 2>&1
echo "dense_lean rc=$? $(date)" >> /tmp/r5_queue.status
