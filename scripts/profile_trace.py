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


def parse_xplane(logdir: str, top: int = 40, n_steps: int = 1):
    """Print op-level stats from the captured xplane protobuf.

    Uses the xprof converter (protobuf pure-python mode required — set
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python in the environment).
    """
    import json

    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    data, _ = raw_to_tool_data.xspace_to_tool_data([paths[-1]], "framework_op_stats", {})
    tbl = json.loads(data if isinstance(data, str) else data.decode())[0]
    cols = [c["id"] for c in tbl["cols"]]
    recs = [dict(zip(cols, [(c["v"] if c else None) for c in r["c"]])) for r in tbl["rows"]]
    dev = [r for r in recs if r.get("host_or_device") == "Device"]
    dev.sort(key=lambda r: -float(r["total_self_time"]))
    total = sum(float(r["total_self_time"]) for r in dev if r["type"] != "IDLE")
    print(f"device busy: {total/1e3/n_steps:.1f} ms/step over {len(dev)} op rows")
    print(f"{'op':62s} {'type':22s} {'ms/st':>7s} {'%':>5s} {'#/st':>5s}")
    for r in dev[:top]:
        if r["type"] == "IDLE":
            continue
        us = float(r["total_self_time"])
        print(
            f"{r['operation'][:62]:62s} {r['type'][:22]:22s} {us/1e3/n_steps:7.2f}"
            f" {100*us/total:5.1f} {float(r['occurrences'])/n_steps:5.1f}"
        )
    cats: dict[str, float] = {}
    for r in dev:
        if r["type"] != "IDLE":
            cats[r["type"]] = cats.get(r["type"], 0.0) + float(r["total_self_time"])
    print("\n== category rollup ==")
    for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{c:40s} {us/1e3/n_steps:8.2f} ms/step {100*us/total:5.1f}%")


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    logdir = os.environ.get("TRACE_DIR", "/tmp/jax_trace")

    if os.environ.get("PARSE_ONLY"):
        parse_xplane(logdir, n_steps=2 * n)
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
    parse_xplane(logdir, n_steps=2 * n)  # warmup chunk + timed chunk


if __name__ == "__main__":
    main()
