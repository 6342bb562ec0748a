"""In-step sweep of the occupancy-compaction budget (--occ_ratio).

Every per-point cost (gathers, scatters, MLP) scales with the compacted
sample count m = max(occ_ratio * S, occ_min); occ_stats.py measures the
REAL occupied-sample distribution on a converged checkpoint (the quality
gate: rays with occupied >= m get truncated), and this script measures the
in-step speed at each candidate ratio on bench.py's 8%-fill ball.

Usage: python scripts/occ_sweep.py [grid ...]   (default: 404 640)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATIOS = [0.45, 0.35, 0.30, 0.25, 0.20]


def main():
    grids = [int(g) for g in (sys.argv[1:] or ["404", "640"])]
    import localrf_tpu.models.local as L

    import bench

    real = L.LocalConfig
    for ratio in RATIOS:
        L.LocalConfig = lambda **kw: real(occ_ratio=ratio, **kw)  # noqa: B023
        try:
            for g in grids:
                ips = bench.bench_stage(g, 10)
                print(
                    f"occ_ratio={ratio:.2f} grid={g}^3:"
                    f" {1000.0 / ips:7.1f} ms/it ({ips:.2f} it/s)",
                    flush=True,
                )
        finally:
            L.LocalConfig = real


if __name__ == "__main__":
    main()
