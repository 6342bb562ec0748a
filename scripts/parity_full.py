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


# ---- v2 (round 5, VERDICT r4 items 2+3) -----------------------------------
# The v1 scene saturated every metric (47-62 dB PSNR / 0.999 SSIM both
# sides: near-texture-free GT) and spawned only 1 RF (estimated drift
# peaked ~0.146 under monocular scale shrink, never reaching
# max_drift=0.28). v2 fixes both:
#   - scene: analytic ray-traced surfaces with high-frequency world-space
#     texture + Gaussian flow/depth supervision noise (RAFT/DPT-like),
#     landing the trained operating point in the discriminating 25-35 dB
#     regime (make_parity_scene._build_analytic_scene);
#   - spawns: max_drift 0.08 (below the measured estimated-drift peak) AND
#     an n_max_frames=14 backstop — the backstop is frame-count-based, so
#     >=2 RFs are guaranteed on BOTH sides regardless of estimated scale
#     (ref: train.py:441-474 `n_frames >= n_max_frames` branch).
# An extra `ours2_f32` arm (f32 gather tables + f32 MLP + highest matmul
# precision) attributes any PSNR delta to table/matmul precision.
V2_SCENE = dict(texture=True, flow_noise_px=1.0, depth_noise=0.05)
V2_FLAG_OVERRIDES = {"--max_drift": "0.08", "--n_max_frames": "14"}
F32_ARM_FLAGS = [
    "--gather_dtype", "float32",
    "--mlp_dtype", "float32",
    "--matmul_precision", "highest",
]


def v2_flags() -> list[str]:
    flags = list(SHARED_FLAGS)
    for k, v in V2_FLAG_OVERRIDES.items():
        flags[flags.index(k) + 1] = v
    return flags


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


def make_scene(work: str, scene_kwargs: dict | None = None):
    scene = os.path.join(work, "scene")
    if os.path.isdir(os.path.join(scene, "images")):
        print("scene exists", flush=True)
        return scene
    from make_parity_scene import write_scene

    os.makedirs(work, exist_ok=True)
    write_scene(
        scene, n_frames=N_FRAMES, fov=FOV, wh=(W, H), **(scene_kwargs or {})
    )
    return scene


def run_reference(work: str, timeout_s: int | None = None, flags=None):
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
    ] + (SHARED_FLAGS if flags is None else flags)
    dt = _stream_run(cmd, REF, env, os.path.join(work, "ref.log"), timeout_s)
    print(f"reference done in {dt:.0f}s", flush=True)
    return dt


def run_ours(
    work: str, timeout_s: int = 4 * 3600, flags=None, arm: str = "our",
    extra_flags=(),
):
    scene = os.path.join(work, "scene")
    logdir = os.path.join(work, f"{arm}_log")
    cmd = [
        sys.executable, "-m", "localrf_tpu.train",
        "--datadir", scene, "--logdir", logdir,
    ] + (SHARED_FLAGS if flags is None else flags) + list(extra_flags)
    # production defaults otherwise (scan_chunk 16 etc.)
    dt = _stream_run(
        cmd, REPO, dict(os.environ), os.path.join(work, f"{arm}s.log"),
        timeout_s,
    )
    print(f"{arm} done in {dt:.0f}s", flush=True)
    return dt


def report(work: str, variant: int = 1):
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
        "variant": variant,
        "scale": {"W": W, "H": H, "n_frames": N_FRAMES,
                  "voxels": "64^3 -> 640^3 (full default ladder)",
                  "flags": SHARED_FLAGS if variant == 1 else v2_flags()},
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
    f32_log = os.path.join(work, "our_f32_log")
    if os.path.isdir(f32_log):
        f32_c2w, f32_focal = pr.load_poses(f32_log)
        res["n_rfs_ours_f32"] = ph.count_our_rfs(f32_log)
        res["f32_focal"] = f32_focal
        res["pose_rmse_ours_f32_vs_gt"] = pr.gauge_aligned_err(
            f32_c2w[:n, :3, 3], gt_t[:n]
        )
        res["our_f32_metrics"] = pr.test_view_metrics(f32_log, scene)
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
    v2 = res.get("variant", 1) == 2
    has_f32 = "our_f32_metrics" in res
    scene_line = (
        "Scene: ANALYTIC ray-traced surfaces (textured ground plane + back"
        " wall + 5 spheres, high-frequency world-space procedural texture),"
        f" {res['scale']['W']}x{res['scale']['H']},"
        f" {res['scale']['n_frames']} frames; exact reprojection flow +"
        " intersection depth, with Gaussian supervision noise (flow sigma"
        " 1 px, inverse-depth 5% — RAFT/DPT-like error statistics)."
        " Non-saturating by design: see 'operating point' below"
        " (scripts/make_parity_scene.py::_build_analytic_scene)."
        if v2
        else "Scene: synthetic geometric scene,"
        f" {res['scale']['W']}x{res['scale']['H']},"
        f" {res['scale']['n_frames']} frames, exact reprojection flow +"
        " rendered depth (scripts/make_parity_scene.py)."
    )
    lines = [
        "# PARITY_FULL — full-scale A/B (ours on TPU vs reference on CPU)"
        + (" — v2" if v2 else ""),
        "",
        scene_line,
        f"Voxel schedule: {res['scale']['voxels']}; both sides run the"
        " reference's own speedup flags (x2 refinement, x2 progressive) and"
        " batch 512; ours uses production TPU defaults otherwise"
        " (bf16 tables/MLP, occ compaction + probe, binned/onehot scatters,"
        " scan_chunk 16)."
        + (
            " v2 spawn config: max_drift 0.08 + n_max_frames 14 backstop"
            " -> >=2 RFs guaranteed on both sides (VERDICT r4 missing #1)."
            if v2
            else ""
        ),
        "",
        "| metric | reference (torch CPU) | ours (localrf_tpu) |"
        + (" ours f32 tables |" if has_f32 else ""),
        "|---|---|---|" + ("---|" if has_f32 else ""),
        f"| RF count | {res['n_rfs_ref']} | {res['n_rfs_ours']} |"
        + (f" {res['n_rfs_ours_f32']} |" if has_f32 else ""),
        f"| pose RMSE vs GT (gauge-aligned) | {res['pose_rmse_ref_vs_gt']:.5f}"
        f" | {res['pose_rmse_ours_vs_gt']:.5f} |"
        + (f" {res['pose_rmse_ours_f32_vs_gt']:.5f} |" if has_f32 else ""),
        f"| focal estimate | {res['ref_focal']:.2f} | {res['our_focal']:.2f} |"
        + (f" {res['f32_focal']:.2f} |" if has_f32 else ""),
    ]
    ref_m, our_m = res["ref_metrics"], res["our_metrics"]
    f32_m = res.get("our_f32_metrics", {})
    for fb in sorted(set(ref_m) & set(our_m)):
        r, o = ref_m[fb], our_m[fb]
        row = (
            f"| test {fb} PSNR / SSIM | {r['psnr']:.2f} / {r['ssim']:.4f}"
            f" | {o['psnr']:.2f} / {o['ssim']:.4f} |"
        )
        if has_f32 and fb in f32_m:
            g = f32_m[fb]
            row += f" {g['psnr']:.2f} / {g['ssim']:.4f} |"
        lines.append(row)
    lines += [
        "",
        f"ours-vs-reference pose track RMSE ="
        f" {res['pose_rmse_ours_vs_ref']:.5f}"
        f" ({res['pose_ours_vs_ref_pct_of_span']:.2f}% of the"
        f" {res['track_span']:.2f} track span).",
        "",
        "Full numbers: `parity_full_results.json` in the workdir;"
        " run logs `ref.log` / `ours.log`"
        + (" / `our_f32s.log`." if has_f32 else "."),
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
    # v2 stages (round 5): textured analytic scene, >=2 guaranteed spawns,
    # f32 precision-attribution arm
    if stage in ("scene2", "all2"):
        make_scene(work, V2_SCENE)
    if stage in ("ref2", "all2"):
        run_reference(work, flags=v2_flags())
    if stage in ("ours2", "all2"):
        run_ours(work, flags=v2_flags())
    if stage in ("ours2_f32", "all2"):
        run_ours(work, flags=v2_flags(), arm="our_f32",
                 extra_flags=F32_ARM_FLAGS)
    if stage in ("report2", "all2"):
        report(work, variant=2)


if __name__ == "__main__":
    main()
