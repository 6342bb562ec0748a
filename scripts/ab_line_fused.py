"""In-step A/B: fused multi-orientation LINE gather at real stages.

Patches the field config built by bench.build_state and reruns the
production fused-chunk step (bench.bench_stage) on the real TPU, so the
numbers include all fusion effects — the forward saves 2 gather dispatches
(amortization: 4.1 -> 2.6 ns/idx with index count, PERF.md roofline) while
the backward keeps the exact per-orientation one-hot dot shapes.
Not part of the test suite.
"""
from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, ".")
import bench

ORIG = bench.build_state


def patched_build(fused: bool):
    def build(grid):
        model, batch = ORIG(grid)
        f = model.fields[-1]
        f["cfg"] = dataclasses.replace(f["cfg"], fused_line_gather=fused)
        return model, batch

    return build


def main():
    grids = [int(g) for g in (sys.argv[1:] or ["255", "404", "640"])]
    for grid in grids:
        for fused in (False, True):
            bench.build_state = patched_build(fused)
            ips = bench.bench_stage(grid, 10)
            print(
                f"grid={grid}^3 fused_line_gather={int(fused)}:"
                f" {1000.0 / ips:7.1f} ms/it  ({ips:.2f} it/s,"
                f" {ips * bench.BATCH:,.0f} rays/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
