#!/bin/bash
# Round-3 benchmark matrix: V8 (RTMV voxel config) + pearl (giga-image)
# end-to-end runs, serialized (ONE TPU client at a time).
set -x
cd /root/repo

# V8: RTMV voxel-mode config, 600 epochs on the synthetic RTMV scene
python -m shacira_tpu.apps.train_nerf \
  --config configs/nerf_V8.yaml \
  --dataset-path /tmp/rtmv_v8 \
  --exp-name v8_r3 --log-dir runs/v8_r3 \
  --hash-layout paged --mip 0 \
  --max-intersections 64 --max-samples 262144 --eval-seg-budget 16384 \
  --log-every 20 \
  > /tmp/v8_r3.log 2>&1
echo "V8 rc=$?"

# pearl: bw23 16-LOD giga-image config on a synthetic 67-Mpix image
python -m shacira_tpu.apps.train_image \
  --config configs/pearl.yaml \
  --dataset-path /tmp/pearl_img \
  --exp-name pearl_r3 --log-dir runs/pearl_r3 \
  --log-every 1 \
  > /tmp/pearl_r3.log 2>&1
echo "pearl rc=$?"
