#!/bin/bash
# Fetch + convert pretrained preprocessing/eval weights (analog of
# ref: scripts/download_weights.sh, which fetches DPT + RAFT checkpoints).
#
# Produces:
#   weights/raft-things.pth         RAFT optical-flow checkpoint (torch)
#   weights/dpt_large-midas.pt      DPT monocular-depth checkpoint (torch)
#   weights/lpips_alex.npz          AlexNet-LPIPS weights converted to the
#                                   pure-JAX evaluator format (utils/lpips.py)
#
# The training/render pipeline itself needs no downloads; these weights feed
# the offline preprocessing CLIs (localrf_tpu.preprocess.run_flow /
# run_depth) and the LPIPS eval metric.
set -e

mkdir -p weights

# --- RAFT (optical flow) ---
if [ ! -f weights/raft-things.pth ]; then
  wget -q https://dl.dropboxusercontent.com/s/4j4z58wuv8o0mfz/models.zip -O /tmp/raft_models.zip
  unzip -j /tmp/raft_models.zip models/raft-things.pth -d weights
  rm /tmp/raft_models.zip
fi

# --- DPT (monocular depth) ---
if [ ! -f weights/dpt_large-midas.pt ]; then
  wget -q https://github.com/intel-isl/DPT/releases/download/1_0/dpt_large-midas-2f21e586.pt \
    -O weights/dpt_large-midas.pt
fi

# --- LPIPS (AlexNet, v0.1) -> JAX npz ---
# Needs `pip install lpips torchvision` in the conversion environment only;
# the training environment never imports torch.
if [ ! -f weights/lpips_alex.npz ]; then
  python - <<'EOF'
import numpy as np
import torchvision
from lpips import LPIPS

from localrf_tpu.utils import lpips as jlpips

alex = torchvision.models.alexnet(weights="IMAGENET1K_V1").state_dict()
lin = LPIPS(net="alex", version="0.1").state_dict()
params = jlpips.load_torch_state(alex, lin)
out = {}
for li in range(5):
    out[f"conv{li}_w"] = np.asarray(params["convs"][li]["w"])
    out[f"conv{li}_b"] = np.asarray(params["convs"][li]["b"])
    out[f"lin{li}"] = np.asarray(params["lins"][li])
np.savez("weights/lpips_alex.npz", **out)
print("wrote weights/lpips_alex.npz")
EOF
fi

echo "weights ready under ./weights"
