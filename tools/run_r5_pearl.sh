#!/bin/bash
# Round-5 pearl end-to-end run (VERDICT item 4), serialized TPU use.
# Small chunk-size per the crash playbook (chunk 256 killed the worker in
# r4; chunk 2 survived — use 4).  valid/save every 5 epochs to bound
# render + checkpoint cost; 20 epochs per the reference config.
set -x
cd /root/repo
while [ ! -f /tmp/pearl_img/synth00.png ]; do sleep 10; done
timeout 10800 python -m shacira_tpu.apps.train_image \
  --config configs/pearl.yaml \
  --dataset-path /tmp/pearl_img \
  --exp-name pearl_r5 --log-dir runs/pearl_r5 \
  --chunk-size 4 --valid-every 5 --save-every 5 --log-every 1 \
  > /tmp/pearl_r5.log 2>&1
echo "pearl rc=$?" >> /tmp/r5_runs.status
