"""Full-scale parity A/B (VERDICT r3 item 3): ours (TPU, production
defaults) vs the actual reference (torch, CPU) through the FULL
coarse-to-fine voxel schedule (64^3 -> 640^3) at >=480p with enough
camera track to trigger >=2 drift-spawned RFs on both sides.

Scale rationale: the r1-r3 parity A/Bs ran at 12 frames / 64x48 / 16^3->30^3
(PARITY_RUN.md) — none of the bf16-table, compaction-slot, or probe
behavior at production point densities was exercised end-to-end. This run
uses the reference's own speedup mechanism (--refinement_speedup_factor /
--prog_speedup_factor, ref: opt.py + train.py:207-220) to fit the torch-CPU
side into a single-digit-hour budget while keeping the *geometry* of the
problem at production scale: full 640^3 final grids, 854x480 frames,
drift-triggered spawns (ref: train.py:441-474).

Usage:
  python scripts/parity_full.py scene <workdir>      # generate the scene
  python scripts/parity_full.py ref   <workdir>      # run the reference (hours)
  python scripts/parity_full.py ours  <workdir>      # run localrf_tpu (TPU)
  python scripts/parity_full.py report <workdir>     # compare + PARITY_FULL.md
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

W, H = 854, 480
N_FRAMES = 24
FOV = 60.0

# Production voxel schedule + the reference's own speedup flags. Batch is
# reduced (the reference CPU side is ~1000x slower per ray than the TPU
# side); both sides see the identical batch so the comparison holds.
SHARED_FLAGS = [
    "--fov", "60",
    "--batch_size", "512",
    "--N_voxel_init", str(64**3),
    "--N_voxel_final", str(640**3),
    "--refinement_speedup_factor", "2",   # 600 -> 300 iters/frame
    "--prog_speedup_factor", "2",         # add_frames_every 100 -> 50
    "--n_init_frames", "5",
    "--n_max_frames", "100",              # spawns must come from drift
    "--max_drift", "0.28",                # ~1.15 track span -> >=2 spawns
    "--n_overlap", "6",
    "--test_frame_every", "8",
    "--vis_every", "1000000",             # no in-loop eval (CPU budget)
    "--render_path", "0",                 # no spline video (CPU budget)
    "--skip_saving_video",
    "--skip_TB_images",
]


def _stream_run(cmd, cwd, env, log_path, timeout_s):
    t0 = time.time()
    with open(log_path, "a", buffering=1) as logf:
        proc = subprocess.run(
            cmd, cwd=cwd, env=env, stdout=logf, stderr=subprocess.STDOUT,
            timeout=timeout_s,
        )
    dt = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"run failed rc={proc.returncode}; see {log_path}")
    return dt


def make_scene(work: str):
    scene = os.path.join(work, "scene")
    if os.path.isdir(os.path.join(scene, "images")):
        print("scene exists", flush=True)
        return scene
    from make_parity_scene import write_scene

    os.makedirs(work, exist_ok=True)
    write_scene(scene, n_frames=N_FRAMES, fov=FOV, wh=(W, H))
    return scene


def run_reference(work: str, timeout_s: int | None = None):
    if timeout_s is None:
        timeout_s = int(os.environ.get("PARITY_FULL_REF_TIMEOUT", 9 * 3600))
    scene = os.path.join(work, "scene")
    logdir = os.path.join(work, "ref_log")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.join(REPO, "scripts", "ref_shims")
    env["CUDA_VISIBLE_DEVICES"] = ""
    # keep torch off multi-thread paths that oversubscribe the 1-core host
    env.setdefault("OMP_NUM_THREADS", "1")
    cmd = [
        "nice", "-n", "19",
        sys.executable, os.path.join(REPO, "scripts", "run_reference.py"),
        "--datadir", scene, "--logdir", logdir, "--device", "cpu",
    ] + SHARED_FLAGS
    dt = _stream_run(cmd, REF, env, os.path.join(work, "ref.log"), timeout_s)
    print(f"reference done in {dt:.0f}s", flush=True)
    return dt


def run_ours(work: str, timeout_s: int = 4 * 3600):
    scene = os.path.join(work, "scene")
    logdir = os.path.join(work, "our_log")
    cmd = [
        sys.executable, "-m", "localrf_tpu.train",
        "--datadir", scene, "--logdir", logdir,
    ] + SHARED_FLAGS  # production defaults otherwise (scan_chunk 16 etc.)
    dt = _stream_run(
        cmd, REPO, dict(os.environ), os.path.join(work, "ours.log"), timeout_s
    )
    print(f"ours done in {dt:.0f}s", flush=True)
    return dt


def report(work: str):
    import parity_hard as ph
    import parity_run as pr

    scene = os.path.join(work, "scene")
    ref_log = os.path.join(work, "ref_log")
    our_log = os.path.join(work, "our_log")
    gt_t = np.load(os.path.join(scene, "gt_poses.npy"))
    ref_c2w, ref_focal = pr.load_poses(ref_log)
    our_c2w, our_focal = pr.load_poses(our_log)
    n = min(len(ref_c2w), len(our_c2w), len(gt_t))
    ref_t, our_t = ref_c2w[:n, :3, 3], our_c2w[:n, :3, 3]
    span = float(np.linalg.norm(gt_t[n - 1] - gt_t[0]))
    res = {
        "scale": {"W": W, "H": H, "n_frames": N_FRAMES,
                  "voxels": "64^3 -> 640^3 (full default ladder)",
                  "flags": SHARED_FLAGS},
        "n_rfs_ref": ph.count_ref_rfs(ref_log),
        "n_rfs_ours": ph.count_our_rfs(our_log),
        "pose_rmse_ref_vs_gt": pr.gauge_aligned_err(ref_t, gt_t[:n]),
        "pose_rmse_ours_vs_gt": pr.gauge_aligned_err(our_t, gt_t[:n]),
        "pose_rmse_ours_vs_ref": pr.gauge_aligned_err(our_t, ref_t),
        "track_span": span,
        "ref_focal": ref_focal,
        "our_focal": our_focal,
        "ref_metrics": pr.test_view_metrics(ref_log, scene),
        "our_metrics": pr.test_view_metrics(our_log, scene),
    }
    res["pose_ours_vs_ref_pct_of_span"] = (
        100.0 * res["pose_rmse_ours_vs_ref"] / span
    )
    out = os.path.join(work, "parity_full_results.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))
    _write_md(res)
    return res


def _write_md(res: dict):
    lines = [
        "# PARITY_FULL — full-scale A/B (ours on TPU vs reference on CPU)",
        "",
        f"Scene: synthetic geometric scene, {res['scale']['W']}x"
        f"{res['scale']['H']}, {res['scale']['n_frames']} frames, exact"
        " reprojection flow + rendered depth (scripts/make_parity_scene.py).",
        f"Voxel schedule: {res['scale']['voxels']}; both sides run the"
        " reference's own speedup flags (x2 refinement, x2 progressive) and"
        " batch 512; ours uses production TPU defaults otherwise"
        " (bf16 tables/MLP, occ compaction + probe, binned/onehot scatters,"
        " scan_chunk 16).",
        "",
        "| metric | reference (torch CPU) | ours (localrf_tpu) |",
        "|---|---|---|",
        f"| RF count | {res['n_rfs_ref']} | {res['n_rfs_ours']} |",
        f"| pose RMSE vs GT (gauge-aligned) | {res['pose_rmse_ref_vs_gt']:.5f}"
        f" | {res['pose_rmse_ours_vs_gt']:.5f} |",
        f"| focal estimate | {res['ref_focal']:.2f} | {res['our_focal']:.2f} |",
    ]
    ref_m, our_m = res["ref_metrics"], res["our_metrics"]
    for fb in sorted(set(ref_m) & set(our_m)):
        r, o = ref_m[fb], our_m[fb]
        lines.append(
            f"| test {fb} PSNR / SSIM | {r['psnr']:.2f} / {r['ssim']:.4f}"
            f" | {o['psnr']:.2f} / {o['ssim']:.4f} |"
        )
    lines += [
        "",
        f"ours-vs-reference pose track RMSE ="
        f" {res['pose_rmse_ours_vs_ref']:.5f}"
        f" ({res['pose_ours_vs_ref_pct_of_span']:.2f}% of the"
        f" {res['track_span']:.2f} track span).",
        "",
        "Full numbers: `parity_full_results.json` in the workdir;"
        " run logs `ref.log` / `ours.log`.",
    ]
    with open(os.path.join(REPO, "PARITY_FULL.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote PARITY_FULL.md", flush=True)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    # abspath: the reference stage runs with cwd=/root/reference, so a
    # relative workdir would resolve against the wrong root
    work = os.path.abspath(
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/parity_full"
    )
    os.makedirs(work, exist_ok=True)
    if stage in ("scene", "all"):
        make_scene(work)
    if stage in ("ref", "all"):
        run_reference(work)
    if stage in ("ours", "all"):
        run_ours(work)
    if stage in ("report", "all"):
        report(work)


if __name__ == "__main__":
    main()
