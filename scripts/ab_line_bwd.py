"""In-step A/B: line-backward strategy + binned plane scatter at real stages.

Patches the field config built by bench.build_state and reruns the
production fused-chunk step (bench.bench_stage) on the real TPU, so the
numbers include all fusion effects — exactly what the microbenches in
scripts/profile_scatter.py cannot show. Not part of the test suite.
"""
from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, ".")
import bench

ORIG = bench.build_state


def patched_build(line_bwd: str, binned: bool):
    def build(grid):
        model, batch = ORIG(grid)
        f = model.fields[-1]
        f["cfg"] = dataclasses.replace(
            f["cfg"], line_bwd=line_bwd, binned_scatter=binned
        )
        return model, batch

    return build


def main():
    grids = [int(g) for g in (sys.argv[1:] or ["404", "640"])]
    variants = [
        ("gather", False),
        ("onehot", False),
        ("onehot", True),
    ]
    for grid in grids:
        for line_bwd, binned in variants:
            bench.build_state = patched_build(line_bwd, binned)
            ips = bench.bench_stage(grid, 10)
            print(
                f"grid={grid}^3 line_bwd={line_bwd:6s} binned={int(binned)}:"
                f" {1000.0 / ips:7.1f} ms/it  ({ips:.2f} it/s,"
                f" {ips * bench.BATCH:,.0f} rays/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
