#!/bin/bash
# Scene-parallel launcher over TPU hosts/slices (analog of the reference's
# per-GPU fan-out, ref: scripts/train_all.sh:4-22). Scenes are independent —
# no cross-scene communication — so multi-slice scaling rides DCN-free.
#
# Usage: DATA_ROOT=/path/to/hikes LOG_ROOT=./logs N_WORKERS=4 bash scripts/train_all.sh

DATA_ROOT=${DATA_ROOT:-./data/hikes}
LOG_ROOT=${LOG_ROOT:-./logs}
N_WORKERS=${N_WORKERS:-1}

SCENES=(forest1 forest2 forest3 garden1 garden2 garden3 indoor playground university1 university2 university3 university4)
FOVS=(59 89 69 59 69 69 69 69 85 73 73 69)

i=0
for idx in "${!SCENES[@]}"; do
  scene=${SCENES[$idx]}
  fov=${FOVS[$idx]}
  worker=$((i % N_WORKERS))
  echo "scene=$scene fov=$fov worker=$worker"
  TPU_WORKER_ID=$worker python -m localrf_tpu.train \
    --datadir "$DATA_ROOT/$scene" \
    --logdir "$LOG_ROOT/$scene" \
    --fov "$fov" &
  i=$((i + 1))
  if (( (i % N_WORKERS) == 0 )); then wait; fi
done
wait
