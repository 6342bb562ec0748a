"""Driver-level throughput (VERDICT r3 item 7): it/s + rays/s of the REAL
`reconstruction()` loop — host sampling, pool syncs, window bookkeeping,
schedule state machine, progress logging — vs bench.py's pure device-chunk
number at the same voxel stage.

Per stage, pins the voxel ladder (N_voxel_init == N_voxel_final), disables
upsample/alpha events, and injects the same ~8%-occupancy ball alpha volume
bench.py uses (stages > 64), so the device work matches bench.py and any
gap is attributable to the host side. Also runs a writer-on arm at the
largest stage to cost the TB logging path (VERDICT r3 weak #8).

Usage: python scripts/bench_driver.py [stages...]   (default: 64 404 640)
Writes a table to stdout; paste into PERF.md.
"""
from __future__ import annotations

import contextlib
import dataclasses
import io
import os
import re
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

W, H = 960, 540
BATCH = 4096
N_VIEWS = 16
N_FRAMES = 8
ITERS_PER_FRAME = 150  # 8 frames x 150 = 1200 driver iterations per stage


def _make_dataset():
    from localrf_tpu.data.dataset import SyntheticDataset

    rng = np.random.default_rng(0)
    rgbs = rng.uniform(0, 1, (N_FRAMES, H, W, 3)).astype(np.float32)
    inv = rng.uniform(0.1, 1, (N_FRAMES, H, W)).astype(np.float32)
    zeros2 = np.zeros((N_FRAMES, H, W, 2), np.float32)
    ones = np.ones((N_FRAMES, H, W), np.float32)
    return SyntheticDataset(
        rgbs, "train", invdepths=inv,
        fwd_flow=zeros2, fwd_mask=ones, bwd_flow=zeros2, bwd_mask=ones,
        n_init_frames=N_FRAMES, test_frame_every=0,
    )


def _inject_ball_alpha(model, grid: int):
    """Same occupancy model as bench.py.build_state: an ~8% ball."""
    import dataclasses as dc

    import jax.numpy as jnp

    g2 = grid // 2
    ax = np.linspace(-1, 1, g2)
    zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = ((xx**2 + yy**2 + zz**2) < 0.535**2).astype(np.float32)
    f = model.fields[-1]
    f["alpha_volume"] = jnp.asarray(vol)
    f["cfg"] = dc.replace(f["cfg"], occ_m=model._occ_m(f["cfg"], True))


def run_stage(grid: int, writer_on: bool):
    from localrf_tpu import train as train_mod
    from localrf_tpu.config import config_parser

    logdir = tempfile.mkdtemp(prefix=f"bench_driver_{grid}_")
    argv = [
        "--datadir", "/nonexistent", "--logdir", logdir,
        "--batch_size", str(BATCH), "--n_views", str(N_VIEWS),
        "--N_voxel_init", str(grid**3), "--N_voxel_final", str(grid**3),
        "--upsamp_list", "999999",
        "--update_AlphaMask_list", "999999",
        "--n_iters_per_frame", str(ITERS_PER_FRAME),
        "--n_init_frames", str(N_FRAMES),
        "--n_max_frames", str(N_FRAMES + 1),
        "--vis_every", "10000000",
        "--progress_refresh_rate", "64",
        "--pixel_pool", "1", "--scan_chunk", "16",
        "--render_test", "0", "--render_path", "0",
        "--skip_saving_video", "--skip_TB_images",
    ]
    args = config_parser(argv)
    ds = _make_dataset()

    orig_make_model = train_mod._make_model
    orig_make_writer = train_mod._make_writer

    def patched_make_model(a, tds):
        model = orig_make_model(a, tds)
        if grid > 64:
            _inject_ball_alpha(model, grid)
        return model

    train_mod._make_model = patched_make_model
    if not writer_on:
        train_mod._make_writer = lambda folder: None
    buf = io.StringIO()
    t0 = time.time()
    try:
        with contextlib.redirect_stdout(buf):
            train_mod.reconstruction(args, train_dataset=ds, test_dataset=ds)
    finally:
        train_mod._make_model = orig_make_model
        train_mod._make_writer = orig_make_writer
    wall = time.time() - t0
    out = buf.getvalue()
    ips_seq = [
        float(m.group(1))
        for m in re.finditer(r"Iteration \d+: ([0-9.]+) it/s", out)
    ]
    iters = max(
        (int(m.group(1)) for m in re.finditer(r"Iteration (\d+):", out)),
        default=0,
    )
    tail = ips_seq[len(ips_seq) // 2 :]
    steady = float(np.median(tail)) if tail else float("nan")
    return steady, iters, wall


def main():
    stages = [int(s) for s in (sys.argv[1:] or ["64", "404", "640"])]
    print(f"driver loop: {N_FRAMES} frames {W}x{H}, batch {BATCH},"
          f" pixel_pool=1 scan_chunk=16, {ITERS_PER_FRAME} it/frame")
    for grid in stages:
        steady, iters, wall = run_stage(grid, writer_on=False)
        print(
            f"stage {grid}^3 writer=off: steady {steady:6.2f} it/s"
            f" ({steady * BATCH:,.0f} rays/s), {iters} iters in {wall:.0f}s"
            f" wall", flush=True,
        )
    # cost the TB logging path at the heaviest stage
    grid = stages[-1]
    steady, iters, wall = run_stage(grid, writer_on=True)
    print(
        f"stage {grid}^3 writer=ON : steady {steady:6.2f} it/s"
        f" ({steady * BATCH:,.0f} rays/s), {iters} iters in {wall:.0f}s wall",
        flush=True,
    )


if __name__ == "__main__":
    main()
