"""Occupancy-compaction quality sweep on a CONVERGED full-scale checkpoint.

occ_stats.py on the parity-v2 checkpoint (640^3, 3 RFs) measured p99
occupied-samples/ray at 64-77% of S with 20-45% of rays truncated at the
default budget (occ_ratio=0.45 -> occ_m=332 of S=738) — yet that same run
scored SSIM at/above the reference, because truncation drops the LAST
occupied samples, which sit behind near-saturated transmittance. This
script measures that directly: render the held-out test frames at several
occ_ratio values (including dense = no compaction) and report PSNR/SSIM
vs GT. The dense arm is the quality ceiling; the gap at each ratio is the
true cost of compaction on a real converged scene.

Usage: python scripts/occ_quality.py <logdir> <scene_dir> [ratio ...]
(ref op this tunes: the reference's ragged AlphaGridMask cull,
tensorBase.py:593-605, which TPU static shapes cannot express directly)
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import cv2

    from localrf_tpu.checkpoint import load_checkpoint
    from localrf_tpu.utils.metrics import rgb_psnr, rgb_ssim

    logdir = sys.argv[1]
    scene = sys.argv[2]
    ratios = [float(r) for r in sys.argv[3:]] or [1.0, 0.45, 0.35, 0.30, 0.25]

    model = load_checkpoint(os.path.join(logdir, "checkpoints.th"))
    w, h = model.cfg.WH
    n = model.blending_weights.shape[0]
    every = max(int(getattr(model.cfg, "test_frame_every", 8) or 8), 1)
    test_ids = list(range(0, n, every))
    gts = {}
    for vid in test_ids:
        p = os.path.join(scene, "images", f"{vid:06d}.jpg")
        if os.path.isfile(p):
            gts[vid] = cv2.imread(p)[..., ::-1].astype(np.float32) / 255.0
    print(f"frames={sorted(gts)} WH=({w},{h}) n_fields={len(model.fields)}", flush=True)

    ray_ids = np.arange(w * h, dtype=np.int32)
    results = {}
    for ratio in ratios:
        model.cfg = dataclasses.replace(model.cfg, occ_ratio=ratio)
        for f in model.fields:
            f["cfg"] = dataclasses.replace(
                f["cfg"],
                occ_m=model._occ_m(f["cfg"], f["alpha_volume"] is not None),
            )
        occ_m = model.fields[-1]["cfg"].occ_m
        row = {"occ_m": occ_m}
        for vid, gt in sorted(gts.items()):
            rgb, _, _, _ = model.forward_eval(
                ray_ids, np.array([vid]), w, h, test_id=True
            )
            im = np.clip(rgb.reshape(h, w, 3), 0, 1)
            row[f"{vid:06d}"] = {
                "psnr": rgb_psnr(gt, im),
                "ssim": rgb_ssim(gt, im, 1.0),
            }
        results[f"{ratio:.2f}"] = row
        mean_psnr = np.mean([v["psnr"] for k, v in row.items() if k != "occ_m"])
        mean_ssim = np.mean([v["ssim"] for k, v in row.items() if k != "occ_m"])
        print(
            f"occ_ratio={ratio:.2f} (occ_m={occ_m}):"
            f" mean PSNR {mean_psnr:.3f} dB, mean SSIM {mean_ssim:.5f}",
            flush=True,
        )
    out = os.path.join(logdir, "occ_quality.json")
    with open(out, "w") as fo:
        json.dump(results, fo, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
