"""Full-stack scientific validation on a synthetic scene with GROUND-TRUTH
flow and depth supervision.

Renders GT images + depth from a known field along a translating camera,
derives analytically-consistent optical flow from the GT depth and relative
poses (the same reprojection the flow loss uses), then runs the REAL driver
(`reconstruction`) with the complete supervision stack — photometric + flow
+ depth + regularizers — including progressive frame appends, upsampling and
occupancy refresh. Asserts held-out-view PSNR improves substantially.

This covers BASELINE.json configs #2-#4 end to end at miniature scale.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localrf_tpu.data.dataset import SyntheticDataset
from localrf_tpu.models.step import render_chunk
from localrf_tpu.models.tensorf import TensorfConfig, init_tensorf
from localrf_tpu.ops.math import (
    get_fwd_bwd_cam2cams,
    get_pred_flow,
)

W, H = 40, 30
N_FRAMES = 10
FOV = 60.0


def _make_gt_scene():
    cfg = TensorfConfig(grid_size=(20, 20, 20), density_shift=-3.0)
    params = init_tensorf(jax.random.PRNGKey(7), cfg)
    for i in range(3):
        p = params[f"density_plane_{i}"]
        for ax in (1, 2):
            p = (jnp.roll(p, 1, ax) + p + jnp.roll(p, -1, ax)) / 3.0
        params[f"density_plane_{i}"] = p * 8.0

    focal = W / (2 * np.tan(np.radians(FOV) / 2))
    center = np.array([W / 2, H / 2], np.float32)
    ray_ids = jnp.arange(W * H, dtype=jnp.int32)

    gt_t = np.stack(
        [np.array([0.05 * i, 0.0, 0.0], np.float32) for i in range(N_FRAMES)]
    )
    c2ws = np.stack(
        [
            np.concatenate([np.eye(3, dtype=np.float32), t[:, None]], -1)
            for t in gt_t
        ]
    )

    imgs, depths = [], []
    for i in range(N_FRAMES):
        rgb, depth, dirs, ij = render_chunk(
            params, cfg, ray_ids, jnp.asarray(c2ws[i][None]),
            jnp.asarray(focal, jnp.float32), jnp.asarray(center), w=W, h=H,
        )
        imgs.append(np.asarray(rgb).reshape(H, W, 3))
        depths.append(np.asarray(depth).reshape(H, W))
    imgs = np.stack(imgs)
    depths = np.stack(depths)

    # analytic flow from GT depth + relative poses (same reprojection math
    # the loss uses — so the supervision is exactly consistent)
    dirs = np.asarray(dirs).reshape(H * W, 3)
    ij = np.asarray(ij).reshape(H * W, 2)
    view_ids = jnp.arange(N_FRAMES)
    fwd_c2c, bwd_c2c = get_fwd_bwd_cam2cams(jnp.asarray(c2ws), view_ids)
    pts = jnp.asarray(dirs)[None] * jnp.asarray(depths.reshape(N_FRAMES, -1))[..., None]
    fwd_flow = np.asarray(
        get_pred_flow(pts, jnp.asarray(ij)[None], fwd_c2c, focal, jnp.asarray(center))
    ).reshape(N_FRAMES, H, W, 2)
    bwd_flow = np.asarray(
        get_pred_flow(pts, jnp.asarray(ij)[None], bwd_c2c, focal, jnp.asarray(center))
    ).reshape(N_FRAMES, H, W, 2)
    masks = np.ones((N_FRAMES, H, W), np.float32)
    invdepths = 1.0 / np.clip(depths, 1e-6, None)
    return imgs, invdepths, fwd_flow, bwd_flow, masks, gt_t


@pytest.mark.slow
def test_full_supervision_stack_driver(tmp_path):
    from localrf_tpu.config import config_parser
    from localrf_tpu.train import reconstruction

    imgs, inv, fwd, bwd, masks, gt_t = _make_gt_scene()

    train_ds = SyntheticDataset(
        imgs, "train", invdepths=inv,
        fwd_flow=fwd, fwd_mask=masks, bwd_flow=bwd, bwd_mask=masks,
        n_init_frames=4, test_frame_every=5,
    )
    test_ds = SyntheticDataset(
        imgs, "test", invdepths=inv,
        fwd_flow=fwd, fwd_mask=masks, bwd_flow=bwd, bwd_mask=masks,
        n_init_frames=4, test_frame_every=5,
    )

    args = config_parser(
        [
            "--logdir", str(tmp_path / "log"),
            "--batch_size", "128",
            "--n_views", "4",
            "--n_init_frames", "4",
            "--n_iters_per_frame", "25",
            "--n_iters_reg", "10",
            "--N_voxel_init", str(16**3),
            "--N_voxel_final", str(24**3),
            "--upsamp_list", "12",
            "--update_AlphaMask_list", "15",
            "--add_frames_every", "8",
            "--n_overlap", "3",
            "--n_max_frames", "20",
            "--max_drift", "100",
            "--test_frame_every", "5",
            "--vis_every", "100000",
            "--fov", str(FOV),
            "--scan_chunk", "8",
            "--render_path", "0",
            "--skip_saving_video",
        ]
    )
    model, _ = reconstruction(args, train_dataset=train_ds, test_dataset=test_ds)

    # held-out view 5 (test frame): render with the trained model
    rgb, _, _, _ = model.forward_eval(
        np.arange(W * H), np.array([5]), W, H, chunk=W * H, test_id=True
    )
    psnr = -10 * np.log10(np.mean((rgb.reshape(H, W, 3) - imgs[5]) ** 2) + 1e-12)
    assert np.isfinite(psnr)
    assert psnr > 16.0, f"held-out PSNR too low: {psnr:.2f} dB"
    # poses should have tracked the GT translation direction (gauge-scaled):
    # at this miniature scale (25 its/frame) we require the dominant learned
    # motion axis to be the GT axis, not a tight ratio
    model.sync_window_to_host()
    t = model.t_all
    motion = t[-1] - t[0]
    assert abs(motion[0]) > abs(motion[1])
    assert abs(motion[0]) > abs(motion[2])
