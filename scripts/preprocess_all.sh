#!/bin/bash
# Preprocess scenes: optical flow (RAFT) + monocular depth (DPT)
# (analog of ref: scripts/preprocess_all.sh). Requires ported weights —
# see localrf_tpu/preprocess/README.md.

DATA_ROOT=${DATA_ROOT:-./data/hikes}
SCENES=${SCENES:-"forest1 forest2 forest3 garden1 garden2 garden3 indoor playground university1 university2 university3 university4"}

for scene in $SCENES; do
  echo "preprocessing $scene"
  python -m localrf_tpu.preprocess.run_flow --data_dir "$DATA_ROOT/$scene"
  python -m localrf_tpu.preprocess.run_depth --data_dir "$DATA_ROOT/$scene"
done
