"""A/B parity run: the actual reference implementation (torch, CPU) vs
localrf_tpu on an identical on-disk synthetic scene.

Runs both trainers end-to-end with matched schedules, then compares
test-view PSNR/SSIM (computed by the same metrics code from each side's
saved test renders), pose trajectories (gauge-aligned, vs the scene's
ground-truth track and vs each other), and focal estimates. Writes
PARITY_RUN.md at the repo root.

Usage: python scripts/parity_run.py [workdir]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REF = "/root/reference/localTensoRF"
sys.path.insert(0, REPO)

SHARED_FLAGS = [
    "--fov", "60",
    "--n_init_frames", "5",
    "--n_iters_per_frame", "60",
    "--n_iters_reg", "20",
    "--batch_size", "256",
    "--N_voxel_init", str(16**3),
    "--N_voxel_final", str(30**3),
    "--upsamp_list", "20", "30", "40",
    "--update_AlphaMask_list", "25", "45",
    "--add_frames_every", "20",
    "--n_max_frames", "10",
    "--max_drift", "10",
    "--n_overlap", "4",
    "--test_frame_every", "5",
    "--vis_every", "100000",
    "--skip_saving_video",
]


def run_reference(scene: str, logdir: str) -> float:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.join(REPO, "scripts", "ref_shims")
    env["CUDA_VISIBLE_DEVICES"] = ""
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "run_reference.py"),
        "--datadir", scene, "--logdir", logdir, "--device", "cpu",
    ] + SHARED_FLAGS
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REF, env=env, capture_output=True, text=True, timeout=7200
    )
    dt = time.time() - t0
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-8000:])
        raise RuntimeError(f"reference run failed rc={proc.returncode}")
    return dt


def run_ours(scene: str, logdir: str) -> float:
    cmd = [
        sys.executable, "-m", "localrf_tpu.train",
        "--datadir", scene, "--logdir", logdir,
        "--scan_chunk", "1",  # bit-exact reference scheduling
    ] + SHARED_FLAGS
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=7200
    )
    dt = time.time() - t0
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-8000:])
        raise RuntimeError(f"our run failed rc={proc.returncode}")
    return dt


def load_poses(logdir: str):
    with open(os.path.join(logdir, "transforms.json")) as f:
        tr = json.load(f)
    frames = sorted(tr["frames"], key=lambda fr: fr["file_path"])
    mats = np.array([fr["transform_matrix"] for fr in frames], np.float32)
    return mats, float(tr.get("fl_x", np.nan))


def gauge_aligned_err(t_a: np.ndarray, t_b: np.ndarray) -> float:
    """RMSE between translation tracks after optimal scale (gauge) fit,
    both centered."""
    a = t_a - t_a.mean(0)
    b = t_b - t_b.mean(0)
    s = float(np.sum(a * b)) / (float(np.sum(a * a)) + 1e-12)
    return float(np.sqrt(np.mean((s * a - b) ** 2)))


def test_view_metrics(logdir: str, scene: str):
    import cv2

    from localrf_tpu.utils.metrics import (
        lpips_backbone,
        rgb_lpips,
        rgb_psnr,
        rgb_ssim,
    )

    # same key discipline as renderer.py:197-207: a random-init backbone's
    # LPIPS is self-consistent (fine for same-backbone A/B deltas) but NOT a
    # publishable LPIPS number — never report it under the plain "lpips" key
    lpips_key = "lpips" if lpips_backbone() == "pretrained" else "lpips_randinit"

    test_dir = os.path.join(logdir, "test", "rgb_maps")
    if not os.path.isdir(test_dir):
        return {}
    out = {}
    for fn in sorted(os.listdir(test_dir)):
        if not fn.endswith((".png", ".jpg")) or "pose" in fn:
            continue
        fbase = os.path.splitext(fn)[0]
        gt_path = os.path.join(scene, "images", f"{fbase}.jpg")
        if not os.path.isfile(gt_path):
            continue
        im = cv2.imread(os.path.join(test_dir, fn))[..., ::-1] / 255.0
        gt = cv2.imread(gt_path)[..., ::-1] / 255.0
        if im.shape != gt.shape:
            im = cv2.resize(im, (gt.shape[1], gt.shape[0]))
        out[fbase] = {
            "psnr": rgb_psnr(gt, im),
            "ssim": rgb_ssim(gt, im, 1.0),
            lpips_key: rgb_lpips(gt.astype(np.float32), im.astype(np.float32)),
            "lpips_backbone": lpips_backbone(),
        }
    return out


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity"
    scene = os.path.join(work, "scene")
    ref_log = os.path.join(work, "ref_log")
    our_log = os.path.join(work, "our_log")
    os.makedirs(work, exist_ok=True)

    if not os.path.isdir(scene):
        from make_parity_scene import write_scene

        write_scene(scene)

    print("== running reference (torch, CPU) ==")
    ref_dt = run_reference(scene, ref_log)
    print(f"reference done in {ref_dt:.0f}s")
    print("== running localrf_tpu ==")
    our_dt = run_ours(scene, our_log)
    print(f"ours done in {our_dt:.0f}s")

    gt_t = np.load(os.path.join(scene, "gt_poses.npy"))
    ref_c2w, ref_focal = load_poses(ref_log)
    our_c2w, our_focal = load_poses(our_log)
    n = min(len(ref_c2w), len(our_c2w), len(gt_t))
    ref_t, our_t = ref_c2w[:n, :3, 3], our_c2w[:n, :3, 3]

    res = {
        "ref_vs_gt": gauge_aligned_err(ref_t, gt_t[:n]),
        "ours_vs_gt": gauge_aligned_err(our_t, gt_t[:n]),
        "ours_vs_ref": gauge_aligned_err(our_t, ref_t),
        "track_span": float(np.linalg.norm(gt_t[n - 1] - gt_t[0])),
        "ref_focal": ref_focal,
        "our_focal": our_focal,
        "ref_runtime_s": ref_dt,
        "our_runtime_s": our_dt,
        "ref_metrics": test_view_metrics(ref_log, scene),
        "our_metrics": test_view_metrics(our_log, scene),
    }
    with open(os.path.join(work, "parity_results.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
