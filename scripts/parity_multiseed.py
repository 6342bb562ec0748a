"""Multi-seed A/B variance study (VERDICT r2 "Next round" #3).

Runs the reference (torch CPU, seed overridden in-process via AB_SEED —
see run_reference.py) and localrf_tpu (--seed) end-to-end on the SAME
on-disk scene for N seeds per side, then reports the per-side PSNR/SSIM
spread vs the cross-implementation gap: is the 1.4-2.4 dB deficit seen in
PARITY_RUN.md inside the cross-seed spread, or systematic?

Usage: python scripts/parity_multiseed.py [workdir] [seed ...]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parity_run import (
    SHARED_FLAGS,
    gauge_aligned_err,
    load_poses,
    run_ours,
    run_reference,
    test_view_metrics,
)


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_ms"
    seeds = [int(s) for s in sys.argv[2:]] or [20211202, 7, 424242]
    scene = os.path.join(work, "scene")
    os.makedirs(work, exist_ok=True)
    if not os.path.isdir(scene):
        from make_parity_scene import write_scene

        write_scene(scene)
    gt_t = np.load(os.path.join(scene, "gt_poses.npy"))

    results = {"seeds": seeds, "ref": {}, "ours": {}}
    out_path = os.path.join(work, "multiseed_results.json")
    for seed in seeds:
        ref_log = os.path.join(work, f"ref_{seed}")
        our_log = os.path.join(work, f"our_{seed}")

        if not os.path.isfile(os.path.join(ref_log, "transforms.json")):
            print(f"== reference seed {seed} ==", flush=True)
            os.environ["AB_SEED"] = str(seed)
            run_reference(scene, ref_log)
            os.environ.pop("AB_SEED", None)
        if not os.path.isfile(os.path.join(our_log, "transforms.json")):
            print(f"== ours seed {seed} ==", flush=True)
            _orig = list(SHARED_FLAGS)
            SHARED_FLAGS.extend(["--seed", str(seed)])
            try:
                run_ours(scene, our_log)
            finally:
                SHARED_FLAGS[:] = _orig

        for side, log in (("ref", ref_log), ("ours", our_log)):
            c2w, focal = load_poses(log)
            n = min(len(c2w), len(gt_t))
            results[side][str(seed)] = {
                "pose_vs_gt": gauge_aligned_err(c2w[:n, :3, 3], gt_t[:n]),
                "focal": focal,
                "metrics": test_view_metrics(log, scene),
            }
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)

    # summary: per-frame PSNR table + spread analysis
    print("\n== PSNR by (side, seed, frame) ==")
    frames = sorted(
        next(iter(results["ref"].values()))["metrics"].keys()
    )
    for side in ("ref", "ours"):
        for seed in seeds:
            m = results[side][str(seed)]["metrics"]
            row = "  ".join(f"{m[fr]['psnr']:6.2f}" for fr in frames)
            print(f"{side:5s} seed={seed:<9d} {row}")
    for stat in ("psnr", "ssim"):
        ref_all = np.array(
            [
                [results["ref"][str(s)]["metrics"][fr][stat] for fr in frames]
                for s in seeds
            ]
        )
        our_all = np.array(
            [
                [results["ours"][str(s)]["metrics"][fr][stat] for fr in frames]
                for s in seeds
            ]
        )
        spread_ref = ref_all.max(0) - ref_all.min(0)
        spread_our = our_all.max(0) - our_all.min(0)
        gap = ref_all.mean(0) - our_all.mean(0)
        print(
            f"{stat}: mean gap(ref-ours) per frame {np.round(gap, 3).tolist()}"
            f" | ref cross-seed spread {np.round(spread_ref, 3).tolist()}"
            f" | ours spread {np.round(spread_our, 3).tolist()}"
        )
    print(f"full results: {out_path}")


if __name__ == "__main__":
    main()
