"""Small-batch throughput curve (VERDICT r3 item 9 decision input).

Under big-mesh ray-batch DP, each chip sees batch/n_chips rays; sample-axis
SP would pay only where per-chip rays/s falls off. This measures the
single-chip rays/s vs per-chip ray count so the SP-in-training decision is
grounded in data (see PERF.md "Sample parallelism in training").

Usage: python scripts/ab_smallbatch.py [grids...]   (default: 404)
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")
import bench

BATCHES = [64, 128, 256, 512, 1024, 2048, 4096]


def main():
    grids = [int(g) for g in (sys.argv[1:] or ["404"])]
    for grid in grids:
        for batch in BATCHES:
            bench.BATCH = batch
            # n_views must divide the batch (view-major sampler)
            bench.N_VIEWS = min(16, max(1, batch // 16))
            try:
                ips = bench.bench_stage(grid, 10)
                print(
                    f"grid={grid}^3 batch={batch}: {1000.0 / ips:7.1f} ms/it"
                    f" ({ips * batch:,.0f} rays/s)",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"grid={grid}^3 batch={batch}: FAILED"
                    f" ({type(e).__name__}: {str(e).splitlines()[0][:100]})",
                    flush=True,
                )


if __name__ == "__main__":
    main()
