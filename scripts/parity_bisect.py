"""Bisect the systematic A/B PSNR gap (VERDICT r2 "Next round" #3, second
half): if the multi-seed study shows the 1.4-2.4 dB deficit is systematic
(outside the cross-seed spread), find the cause by re-running OUR side with
the perf defaults individually reverted on the same scene + seed.

Hypothesis ranking (see PARITY_RUN.md): the parity scene trains to ~50 dB
PSNR == RMSE ~0.003, which is the resolution of bfloat16 (eps/2 ~ 0.004) —
the bf16 gather-table + bf16 MLP defaults should cap exactly there, while
being invisible at real-scene operating points (20-35 dB).

Usage: python scripts/parity_bisect.py [workdir] [seed]
  expects workdir/scene to exist (reuses the multiseed scene).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parity_run import SHARED_FLAGS, run_ours, test_view_metrics

VARIANTS = {
    # one lever at a time, most-suspected first
    "f32_tables": ["--gather_dtype", "float32"],
    "f32_mlp": ["--mlp_dtype", "float32"],
    "f32_both": ["--gather_dtype", "float32", "--mlp_dtype", "float32"],
    "no_occ": ["--occ_ratio", "1.0"],
    # RESOLVED — the deficit was the truncating uint8 save, not numerics
    # (PARITY_RUN.md "Root cause"): the CPU control arms
    # (scripts/parity_cpu.py, exact f32 matmuls) showed the gap is
    # platform/precision-independent, and pixel forensics + the rounding
    # fix closed it at/above reference parity on both bf16 and f32 arms.
    # The precision arms below are therefore moot and removed from the
    # scarce TPU queue; re-add if a precision question ever reopens:
    #   "prec_only": ["--matmul_precision", "highest"],
    #   "f32_strict": [... + "--line_bwd", "gather", "--binned_scatter", "0",
    #                  "--use_pallas", "0"],
    #   "no_topk": ["--app_top_k", "0"],   (inert on this scene: s <= K)
    # quality gate for flipping the coarse march probe on by default
    # (VERDICT r2 #6 requires "measured rays/s gain at A/B parity"):
    # same scene + seed with the probe active; compare vs ours-default and
    # the reference band in MULTISEED.json
    "probe_ds4": ["--occ_probe_ds", "4"],
}


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_ms"
    seed = sys.argv[2] if len(sys.argv) > 2 else "20211202"
    scene = os.path.join(work, "scene")
    assert os.path.isdir(scene), f"no scene at {scene}"
    out_path = os.path.join(work, "bisect_results.json")
    results = {}
    if os.path.isfile(out_path):
        results = json.load(open(out_path))

    for name, flags in VARIANTS.items():
        log = os.path.join(work, f"bisect_{name}_{seed}")
        if name not in results:
            print(f"== bisect {name} seed {seed} ==", flush=True)
            if not os.path.isfile(os.path.join(log, "transforms.json")):
                _orig = list(SHARED_FLAGS)
                SHARED_FLAGS.extend(["--seed", seed] + flags)
                try:
                    run_ours(scene, log)
                finally:
                    SHARED_FLAGS[:] = _orig
            results[name] = test_view_metrics(log, scene)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=2)

    print("\n== bisect PSNR by (variant, frame) ==")
    for name, m in results.items():
        row = "  ".join(f"{fr}:{v['psnr']:6.2f}" for fr, v in sorted(m.items()))
        print(f"{name:12s} {row}")


if __name__ == "__main__":
    main()
