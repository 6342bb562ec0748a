"""In-step A/B of the round-3 pending defaults, in ONE process.

Measures at the given stages (default: 640, the stage holding 300/600 of
the schedule weight): the current default config, the coarse march probe
(occ_probe_ds=4 + exact refine — the config whose quality gate already
passed bit-exactly on the parity scene), the fused line gather, and the
two combined. One process so the default config's executable is shared
and the comparison is same-session/same-tunnel. Not part of the test
suite; needs the real TPU.
"""
from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, ".")
import bench

ORIG = bench.build_state

# Arms are expressed RELATIVE to the committed defaults (occ_probe_ds=4,
# fused_plane_gather=False, fused_line_gather=False as of round 3): each
# non-default arm sets its flags explicitly, so the script stays a valid
# A/B as defaults move.
VARIANTS = [
    ("default", {}),
    ("exact", {"occ_probe_ds": 0}),             # negative arm: exact cull
    ("fused_plane", {"fused_plane_gather": True}),   # opt-in arm
    ("fused_line", {"fused_line_gather": True}),     # opt-in arm
    ("fused_both", {
        "fused_plane_gather": True, "fused_line_gather": True,
    }),
    # round-4: the fused Pallas march core (ops/pallas/march.py)
    ("fused_march", {"fused_march": True}),
    # round-4: forward-fused gathers, per-segment backwards
    ("fwdfused", {"fused_fwd_gather": 1}),
    ("fwdfused_lines", {"fused_fwd_gather": 2}),
    # round-4: binned-scatter row threshold sweep (decided: binned wins at
    # every schedule stage — default is now 2000). binned65k is the r3
    # default kept as the negative arm; the finer arms remain for re-sweeps.
    ("binned65k", {"binned_min_rows": 65536}),
    ("binned25k", {"binned_min_rows": 25000}),
    ("binned60k", {"binned_min_rows": 60000}),
    ("binned8k", {"binned_min_rows": 8000}),    # 101^3 planes = 10,201 rows
    ("binned2k", {"binned_min_rows": 2000}),    # 64^3 planes = 4,096 rows
]


def patched_build(over):
    def build(grid):
        model, batch = ORIG(grid)
        f = model.fields[-1]
        f["cfg"] = dataclasses.replace(f["cfg"], **over)
        return model, batch
    return build


def main():
    only = None
    argv = sys.argv[1:]
    if argv and argv[0] == "--only":  # comma-separated variant names
        only = set(argv[1].split(","))
        argv = argv[2:]
    grids = [int(g) for g in (argv or ["640"])]
    for grid in grids:
        for name, over in VARIANTS:
            if only is not None and name not in only:
                continue
            bench.build_state = patched_build(over)
            ips = bench.bench_stage(grid, 10)
            print(
                f"grid={grid}^3 {name}: {1000.0 / ips:7.1f} ms/it"
                f" ({ips:.2f} it/s, {ips * bench.BATCH:,.0f} rays/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
