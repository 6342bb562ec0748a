"""Capture a jax.profiler trace of the full train step and print the
per-HLO-op time breakdown (top ops + category rollup) from the XPlane.

Usage: python scripts/profile_trace.py [grid] [n_steps]
Not part of the test suite; needs the real TPU.
"""
from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_xplane(logdir: str, top: int = 40):
    """Print op-level stats from the captured xplane protobuf."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    xplane = paths[-1]
    data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], "framework_op_stats", {})
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data)))
    # rows: host and device ops; keep device, sort by total self time
    dev = [r for r in rows if r.get("host_or_device", "").lower() == "device"]
    key = "total_self_time_us" if dev and "total_self_time_us" in dev[0] else None
    if key is None and dev:
        print("columns:", list(dev[0].keys()))
        return
    dev.sort(key=lambda r: -float(r[key]))
    total = sum(float(r[key]) for r in dev)
    print(f"device total self time: {total/1e3:.1f} ms over {len(dev)} op types")
    print(f"{'op':60s} {'type':28s} {'ms':>8s} {'%':>5s} {'#':>6s}")
    for r in dev[:top]:
        ms = float(r[key]) / 1e3
        print(
            f"{r['operation'][:60]:60s} {r['type'][:28]:28s} {ms:8.2f}"
            f" {100*float(r[key])/total:5.1f} {r.get('occurrences',''):>6s}"
        )
    # category rollup
    cats: dict[str, float] = {}
    for r in dev:
        cats[r["type"]] = cats.get(r["type"], 0.0) + float(r[key])
    print("\n== category rollup ==")
    for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{c:40s} {us/1e3:8.2f} ms {100*us/total:5.1f}%")


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    logdir = os.environ.get("TRACE_DIR", "/tmp/jax_trace")

    if os.environ.get("PARSE_ONLY"):
        parse_xplane(logdir)
        return

    import jax

    import bench

    # build + warmup outside the trace
    t0 = time.perf_counter()
    ips = bench.bench_stage(grid, n)
    print(f"untraced {grid}^3: {1000/ips:.1f} ms/it ({time.perf_counter()-t0:.0f}s total)")

    # trace one timed chunk
    import jax.profiler

    with jax.profiler.trace(logdir):
        ips = bench.bench_stage(grid, n)
    print(f"traced {grid}^3: {1000/ips:.1f} ms/it")
    parse_xplane(logdir)


if __name__ == "__main__":
    main()
