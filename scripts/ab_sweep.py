"""Operating-point re-sweep under the round-3 kernels (VERDICT r3 item 2).

PERF.md's "4096 rays is the throughput peak (8192 falls, 16k OOMs)" was
measured with the old XLA scatter emitter and f32 Adam moments. The binned
plane scatter + one-hot line backward change the per-index amortization and
`moment_dtype=bfloat16` frees HBM, so the peak must be re-located.

Sweeps batch x moment_dtype at the given stages in ONE process (relative,
same-session numbers). Usage:
  python scripts/ab_sweep.py [grids...]        (default: 404 640)
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")
import bench
from localrf_tpu.optim import pytree_adam_init

ORIG = bench.build_state

BATCHES = [4096, 8192, 16384]
MOMENTS = ["float32", "bfloat16"]


def patched_build(moment_dtype):
    def build(grid):
        model, batch = ORIG(grid)
        if moment_dtype != "float32":
            f = model.fields[-1]
            f["opt"] = pytree_adam_init(f["params"], moment_dtype)
        return model, batch

    return build


def main():
    grids = [int(g) for g in (sys.argv[1:] or ["404", "640"])]
    for grid in grids:
        for batch in BATCHES:
            for mom in MOMENTS:
                bench.BATCH = batch
                bench.build_state = patched_build(mom)
                try:
                    ips = bench.bench_stage(grid, 10)
                    print(
                        f"grid={grid}^3 batch={batch} moments={mom}:"
                        f" {1000.0 / ips:7.1f} ms/it"
                        f" ({ips * batch:,.0f} rays/s)",
                        flush=True,
                    )
                except Exception as e:
                    print(
                        f"grid={grid}^3 batch={batch} moments={mom}:"
                        f" FAILED ({type(e).__name__}:"
                        f" {str(e).splitlines()[0][:120]})",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
