"""Same-hardware throughput anchor: reference (torch) vs ours, both on CPU.

BASELINE.md's protocol can't be run as published (no A100, no real scenes in
this environment), so bench.py's `vs_baseline` divides by a NOMINAL 50k
rays/s A100 figure. This script produces a measured anchor instead: both
trainers on the identical scene, identical schedule, identical batch and
voxel count, on the same CPU — the ratio is direct evidence of
implementation efficiency independent of the hardware assumption.

Setup mirrors scripts/parity_run.py but pins the voxel stage (no upsampling,
no alpha updates) and disables rendering so the steady-state train step
dominates; it parses each side's per-iteration "it/s" log lines and reports
the median of the steady-state tail.

Usage: python scripts/baseline_anchor.py <scene_dir> [out.json]
(generate a scene with scripts/make_parity_scene.py first)
"""
from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/localTensoRF"

BATCH = 4096
VOXELS = 64**3
SHARED = [
    "--fov", "60",
    "--batch_size", str(BATCH),
    "--N_voxel_init", str(VOXELS),
    "--N_voxel_final", str(VOXELS),
    "--upsamp_list", "999999",
    "--update_AlphaMask_list", "999999",
    "--n_init_frames", "5",
    "--n_max_frames", "7",
    "--add_frames_every", "120",
    "--n_iters_per_frame", "240",
    "--n_iters_reg", "60",
    "--refinement_speedup_factor", "1.0",
    "--prog_speedup_factor", "1.0",
    "--vis_every", "999999",
    "--progress_refresh_rate", "10",
    "--downsampling", "1",
    "--test_frame_every", "0",
    "--L1_weight", "0",
    "--TV_weight_density", "0",
    "--TV_weight_app", "0",
]

IT_RE = re.compile(r"Iteration \d+: ([0-9.]+) it/s")


def steady_its(stdout: str) -> float:
    vals = [float(m) for m in IT_RE.findall(stdout)]
    if len(vals) < 4:
        raise RuntimeError(f"too few it/s samples: {vals}")
    tail = vals[len(vals) // 2 :]  # skip warmup/compile half
    return statistics.median(tail)


def run_reference(scene: str, logdir: str) -> tuple[float, float]:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.join(REPO, "scripts", "ref_shims")
    env["CUDA_VISIBLE_DEVICES"] = ""
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "run_reference.py"),
        "--datadir", scene, "--logdir", logdir, "--device", "cpu",
    ] + SHARED
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REF, env=env, capture_output=True, text=True, timeout=5400)
    dt = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"reference failed rc={proc.returncode}")
    return steady_its(proc.stdout), dt


def run_ours(scene: str, logdir: str) -> tuple[float, float]:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "-m", "localrf_tpu.train",
        "--datadir", scene, "--logdir", logdir, "--scan_chunk", "10",
    ] + SHARED
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=5400)
    dt = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"ours failed rc={proc.returncode}")
    return steady_its(proc.stdout), dt


def main():
    scene = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    ref_its, ref_dt = run_reference(scene, "/tmp/anchor_ref")
    print(f"reference (torch CPU): {ref_its:.2f} it/s  (wall {ref_dt:.0f}s)")
    our_its, our_dt = run_ours(scene, "/tmp/anchor_ours")
    print(f"ours (JAX CPU):        {our_its:.2f} it/s  (wall {our_dt:.0f}s)")
    ratio = our_its / ref_its
    print(f"ours / reference same-CPU throughput: {ratio:.2f}x")
    if out_path:
        json.dump(
            {
                "batch": BATCH, "voxels": VOXELS,
                "reference_cpu_its": round(ref_its, 3),
                "ours_cpu_its": round(our_its, 3),
                "ratio": round(ratio, 3),
            },
            open(out_path, "w"), indent=1,
        )


if __name__ == "__main__":
    main()
