"""In-step sweep of the binned-scatter kernel's (tile_rows, chunk) shape.

The kernel is grid-step-count-bound (~4.7 us/step fixed overhead vs ~0.2 us
of MXU work per step, PERF.md), so the step count (P/chunk + T/tile_rows)
is the knob. Each config runs in a SUBPROCESS with the env overrides set
before import (the constants are bound at module-import time and baked into
jit caches). Not part of the test suite; needs the real TPU.

Usage: python scripts/ab_binned_shape.py [grid ...]
"""
from __future__ import annotations

import os
import subprocess
import sys

CONFIGS = [
    (256, 1024),   # current default
    (256, 4096),
    (512, 2048),
    (512, 4096),
    (1024, 2048),  # onehot 1024x2048 bf16 = 4 MB VMEM — upper edge
]


def main():
    grids = sys.argv[1:] or ["404", "640"]
    here = os.path.dirname(os.path.abspath(__file__))
    for tile_rows, chunk in CONFIGS:
        env = dict(os.environ)
        env["LOCALRF_BINNED_TILE_ROWS"] = str(tile_rows)
        env["LOCALRF_BINNED_CHUNK"] = str(chunk)
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "import bench\n"
            "for g in %r:\n"
            "    ips = bench.bench_stage(int(g), 10)\n"
            "    print(f'tile_rows=%d chunk=%d grid={g}^3:"
            " {1000.0/ips:7.1f} ms/it ({ips:.2f} it/s)', flush=True)\n"
            % (os.path.dirname(here), grids, tile_rows, chunk)
        )
        r = subprocess.run(
            [sys.executable, "-c", code], env=env,
            cwd=os.path.dirname(here), timeout=1800,
        )
        if r.returncode != 0:
            print(f"tile_rows={tile_rows} chunk={chunk}: FAILED rc={r.returncode}")


if __name__ == "__main__":
    main()
