"""In-step A/B: coarse march probe (occ_probe_ds) at real stages.

Patches the field config built by bench.build_state and reruns the
production fused-chunk step on the real TPU (same protocol as
ab_line_bwd.py), so the numbers include all fusion effects. Not part of
the test suite.
"""
from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, ".")
import bench

ORIG = bench.build_state


def patched_build(probe_ds: int, refine: bool):
    def build(grid):
        model, batch = ORIG(grid)
        f = model.fields[-1]
        f["cfg"] = dataclasses.replace(
            f["cfg"], occ_probe_ds=probe_ds, occ_refine=refine
        )
        return model, batch

    return build


def main():
    grids = [int(g) for g in (sys.argv[1:] or ["255", "404", "640"])]
    variants = [
        (0, True),   # exact per-sample cull (current default)
        (2, True),
        (4, True),
        (4, False),  # coarse-only cull (no fine refine)
        (8, True),
    ]
    for grid in grids:
        for ds, refine in variants:
            bench.build_state = patched_build(ds, refine)
            ips = bench.bench_stage(grid, 10)
            print(
                f"grid={grid}^3 probe_ds={ds} refine={int(refine)}:"
                f" {1000.0 / ips:7.1f} ms/it  ({ips:.2f} it/s,"
                f" {ips * bench.BATCH:,.0f} rays/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
