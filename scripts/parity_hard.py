"""Hard-mechanism A/B (VERDICT r2 "Next round" #4): a parity run where the
reference's difficult paths actually fire —

- drift-triggered RF spawning: 28-frame track (span 1.35) with
  --max_drift 0.3 and a window cap (--n_max_frames 16) that drift beats,
  so `append_rf` fires on drift (ref local_tensorfs.py:116-146,
  train.py:443-465), not only on window-full;
- intrinsics optimization: the scene is RENDERED at fov 66 but both
  trainers are told --fov 60 with --lr_i_init 1e-3, so the focal must move
  ~12% toward truth (ref local_tensorfs.py:100-107, 229-237);
- exposure compensation: per-frame deterministic gain jitter +/-8%
  (--lr_exposure_init 1e-3 is the reference default).

Usage: python scripts/parity_hard.py [workdir]
"""
from __future__ import annotations

import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import parity_run as pr

TRUE_FOV = 66.0
N_FRAMES = 28

HARD_FLAGS = [
    "--fov", "60",          # deliberately wrong: intrinsics must correct it
    "--lr_i_init", "1e-3",
    "--lr_exposure_init", "1e-3",
    "--n_init_frames", "5",
    "--n_iters_per_frame", "60",
    "--n_iters_reg", "20",
    "--batch_size", "256",
    "--N_voxel_init", str(16**3),
    "--N_voxel_final", str(30**3),
    "--upsamp_list", "20", "30", "40",
    "--update_AlphaMask_list", "25", "45",
    "--add_frames_every", "20",
    "--n_max_frames", "16",
    "--max_drift", "0.3",
    "--n_overlap", "4",
    "--test_frame_every", "5",
    "--vis_every", "100000",
    "--skip_saving_video",
]


def count_ref_rfs(logdir: str) -> int:
    import torch

    ckpt = torch.load(
        os.path.join(logdir, "checkpoints.th"),
        map_location="cpu", weights_only=False,
    )
    ids = {
        k.split(".")[1] for k in ckpt["state_dict"] if k.startswith("tensorfs.")
    }
    return len(ids)


def count_our_rfs(logdir: str) -> int:
    with open(os.path.join(logdir, "checkpoints.th"), "rb") as f:
        state = pickle.load(f)
    return len(state["fields"])


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_hard"
    scene = os.path.join(work, "scene")
    ref_log = os.path.join(work, "ref_log")
    our_log = os.path.join(work, "our_log")
    os.makedirs(work, exist_ok=True)
    if not os.path.isdir(scene):
        from make_parity_scene import write_scene

        write_scene(scene, n_frames=N_FRAMES, fov=TRUE_FOV, exposure_jitter=0.08)

    pr.SHARED_FLAGS[:] = HARD_FLAGS
    if not os.path.isfile(os.path.join(ref_log, "transforms.json")):
        print("== reference (torch CPU), hard scene ==", flush=True)
        ref_dt = pr.run_reference(scene, ref_log)
        print(f"reference done in {ref_dt:.0f}s", flush=True)
    if not os.path.isfile(os.path.join(our_log, "transforms.json")):
        print("== localrf_tpu, hard scene ==", flush=True)
        our_dt = pr.run_ours(scene, our_log)
        print(f"ours done in {our_dt:.0f}s", flush=True)

    gt_t = np.load(os.path.join(scene, "gt_poses.npy"))
    ref_c2w, ref_focal = pr.load_poses(ref_log)
    our_c2w, our_focal = pr.load_poses(our_log)
    n = min(len(ref_c2w), len(our_c2w), len(gt_t))
    ref_t, our_t = ref_c2w[:n, :3, 3], our_c2w[:n, :3, 3]

    w = 64
    focal_init = w / (2 * np.tan(np.radians(60.0) / 2))
    focal_true = w / (2 * np.tan(np.radians(TRUE_FOV) / 2))
    res = {
        "n_rfs_ref": count_ref_rfs(ref_log),
        "n_rfs_ours": count_our_rfs(our_log),
        "ref_vs_gt": pr.gauge_aligned_err(ref_t, gt_t[:n]),
        "ours_vs_gt": pr.gauge_aligned_err(our_t, gt_t[:n]),
        "ours_vs_ref": pr.gauge_aligned_err(our_t, ref_t),
        "track_span": float(np.linalg.norm(gt_t[n - 1] - gt_t[0])),
        "focal_init": focal_init,
        "focal_true": focal_true,
        "ref_focal": ref_focal,
        "our_focal": our_focal,
        "ref_metrics": pr.test_view_metrics(ref_log, scene),
        "our_metrics": pr.test_view_metrics(our_log, scene),
    }
    with open(os.path.join(work, "parity_hard_results.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
