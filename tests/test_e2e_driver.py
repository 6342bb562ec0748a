"""End-to-end driver test: build a tiny scene on disk (images/, depth/,
flow_ds/), run `reconstruction` through the real CLI config, check outputs
(checkpoints, transforms.json, test renders) and the render-only path."""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from localrf_tpu.config import config_parser
from localrf_tpu.data.flow_io import encode_flow


W, H = 40, 30
N_FRAMES = 8


def make_scene_dir(root):
    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/images")
    os.makedirs(f"{root}/depth")
    os.makedirs(f"{root}/flow_ds")
    base = (rng.uniform(0.2, 0.8, (H, W, 3)) * 255).astype(np.uint8)
    for i in range(N_FRAMES):
        img = np.clip(base.astype(np.int32) + i * 2, 0, 255).astype(np.uint8)
        cv2.imwrite(f"{root}/images/{i:06d}.jpg", img[..., ::-1])
        inv = (rng.uniform(0.1, 1.0, (H, W)) * 65535).astype(np.uint16)
        cv2.imwrite(f"{root}/depth/{i:06d}.png", inv)
        flow = rng.uniform(-1, 1, (H, W, 2)).astype(np.float32)
        mask = np.ones((H, W), bool)
        enc = encode_flow(flow, mask)
        cv2.imwrite(f"{root}/flow_ds/fwd_{i:06d}.png", enc)
        cv2.imwrite(f"{root}/flow_ds/bwd_{i:06d}.png", enc)


@pytest.mark.slow
def test_reconstruction_end_to_end(tmp_path):
    from localrf_tpu.train import reconstruction, render_test

    scene = str(tmp_path / "scene")
    log = str(tmp_path / "log")
    make_scene_dir(scene)

    args = config_parser(
        [
            "--datadir", scene,
            "--logdir", log,
            "--batch_size", "64",
            "--n_views", "4",
            "--n_init_frames", "3",
            "--n_iters_per_frame", "6",
            "--n_iters_reg", "3",
            "--N_voxel_init", str(14**3),
            "--N_voxel_final", str(20**3),
            "--upsamp_list", "4",
            "--update_AlphaMask_list", "5",
            "--add_frames_every", "3",
            "--n_overlap", "2",
            "--n_max_frames", "6",
            "--max_drift", "100",
            "--test_frame_every", "4",
            "--vis_every", "1000",
            "--fov", "60",
            "--scan_chunk", "4",
            "--pixel_pool", "1",
            "--skip_saving_video",
        ]
    )
    model, metrics = reconstruction(args)

    assert os.path.isfile(f"{log}/checkpoints.th")
    assert os.path.isfile(f"{log}/transforms.json")
    assert os.path.isfile(f"{log}/transforms_rf.json")
    with open(f"{log}/transforms.json") as f:
        tr = json.load(f)
    assert len(tr["frames"]) == model.n_frames
    assert tr["w"] == W and tr["h"] == H
    # test renders were written
    assert os.path.isdir(f"{log}/test/rgb_maps")
    pngs = [p for p in os.listdir(f"{log}/test/rgb_maps") if p.endswith(".png")]
    assert len(pngs) >= 1
    # smoothed-path renders
    assert os.path.isdir(f"{log}/smooth_spline/rgb_maps")

    # render-only entry restores from the checkpoint and renders again
    args.render_only = 1
    args.render_path = 0
    args.logdir = log
    render_test(args)


def test_renderer_annotate(tmp_path):
    """The annotate overlay path runs and writes frames."""
    import numpy as np

    from localrf_tpu.data.dataset import SyntheticDataset
    from localrf_tpu.models.local import LocalConfig, LocalTensorfs
    from localrf_tpu.models.tensorf import TensorfConfig
    from localrf_tpu.renderer import render

    rng = np.random.default_rng(2)
    rgbs = rng.uniform(0, 1, (6, H, W, 3)).astype(np.float32)
    train_ds = SyntheticDataset(rgbs, "train", n_init_frames=6, test_frame_every=4)
    test_ds = SyntheticDataset(rgbs, "test", n_init_frames=6, test_frame_every=4)
    cfg = LocalConfig(
        fov=60.0, n_init_frames=6, WH=(W, H), n_views=4, batch_size=64,
        tensorf=TensorfConfig(grid_size=(12, 12, 12)),
        loss_flow_weight=0.0, loss_depth_weight=0.0,
    )
    model = LocalTensorfs(cfg)

    class A:
        batch_size = W * H
        device = "cpu"

    out = render(
        test_ds, model.get_cam2world(), model, A(), w=W, h=H,
        save_path=str(tmp_path), save_frames=True, test=True,
        train_dataset=train_ds, img_format="png", annotate=True,
    )
    metrics = out[-1]
    assert len(metrics) >= 1
    for m in metrics.values():
        # eval logs the full metric triple; lpips is finite, labeled with
        # the backbone variant, and reported under a distinct key when the
        # backbone is not pretrained (ADVICE r2)
        assert np.isfinite(m["mse"]) and np.isfinite(m["ssim"])
        assert m["lpips_backbone"] in ("pretrained", "random-init")
        lpips_key = (
            "lpips" if m["lpips_backbone"] == "pretrained" else "lpips_randinit"
        )
        assert np.isfinite(m[lpips_key])
    import os
    assert os.path.isdir(f"{tmp_path}/rgb_maps")


@pytest.mark.slow
def test_reconstruction_pool_with_data_parallel(tmp_path):
    """The CLI composes --pixel_pool with --data_parallel (the pool gate on
    an absent mesh was removed): pooled index-stream batches run over a
    2-device mesh end-to-end."""
    from localrf_tpu.train import reconstruction

    scene = str(tmp_path / "scene")
    log = str(tmp_path / "log")
    make_scene_dir(scene)

    args = config_parser(
        [
            "--datadir", scene,
            "--logdir", log,
            "--batch_size", "64",
            "--n_views", "4",
            "--n_init_frames", "3",
            "--n_iters_per_frame", "6",
            "--n_iters_reg", "3",
            "--N_voxel_init", str(14**3),
            "--N_voxel_final", str(14**3),
            "--upsamp_list", "1000",
            "--update_AlphaMask_list", "1000",
            "--add_frames_every", "3",
            "--n_overlap", "2",
            "--n_max_frames", "5",
            "--max_drift", "100",
            "--test_frame_every", "0",
            "--vis_every", "1000",
            "--fov", "60",
            "--scan_chunk", "4",
            "--pixel_pool", "1",
            "--data_parallel", "2",
            "--skip_saving_video",
        ]
    )
    model, metrics = reconstruction(args)
    assert model.mesh is not None and model.mesh.size == 2
    assert model.pool is not None
    assert os.path.isfile(f"{log}/checkpoints.th")
