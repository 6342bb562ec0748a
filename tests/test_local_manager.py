"""Integration: progressive manager drives jitted steps on a tiny synthetic
scene — loss decreases, frames/fields append, window slides, eval renders."""
import dataclasses

import numpy as np
import pytest

from localrf_tpu.data.dataset import SyntheticDataset
from localrf_tpu.models.local import LocalConfig, LocalTensorfs
from localrf_tpu.models.tensorf import TensorfConfig

W, H = 24, 18
N_FRAMES = 12


def make_scene():
    rng = np.random.default_rng(3)
    # slowly varying colored gradient video
    base = rng.uniform(0.2, 0.8, (H, W, 3)).astype(np.float32)
    rgbs = np.stack(
        [np.clip(base + 0.01 * t, 0, 1) for t in range(N_FRAMES)], 0
    ).astype(np.float32)
    inv = rng.uniform(0.1, 1.0, (N_FRAMES, H, W)).astype(np.float32)
    flow = np.zeros((N_FRAMES, H, W, 2), np.float32)
    mask = np.ones((N_FRAMES, H, W), np.float32)
    return rgbs, inv, flow, mask


@pytest.fixture(scope="module")
def setup():
    rgbs, inv, flow, mask = make_scene()
    ds = SyntheticDataset(
        rgbs, "train", invdepths=inv,
        fwd_flow=flow, fwd_mask=mask, bwd_flow=flow, bwd_mask=mask,
        n_init_frames=3, test_frame_every=5,
    )
    cfg = LocalConfig(
        fov=60.0,
        n_init_frames=3,
        n_overlap=2,
        WH=(W, H),
        n_iters_per_frame=8,
        n_iters_reg=4,
        N_voxel_list={6: 24**3},
        update_AlphaMask_list=[7],
        n_views=4,
        batch_size=64,
        tensorf=TensorfConfig(grid_size=(16, 16, 16)),
        loss_flow_weight=1.0,
        loss_depth_weight=0.1,
        l1_weight=1e-2,
    )
    model = LocalTensorfs(cfg)
    return ds, cfg, model


@pytest.mark.slow  # 26 s: multi-stage integration loop; unit paths covered by the other manager tests
def test_progressive_training_loop(setup):
    ds, cfg, model = setup
    losses = []
    n_added = 0
    iteration = 0
    # mimic the reference reconstruction loop at miniature scale
    for _ in range(120):
        batch = ds.sample(cfg.batch_size, model.is_refining, True, n_views=cfg.n_views)
        if batch["train_test_poses"]:
            model.optimizer_step_poses_only(batch)
            can_add_rf = False
        else:
            can_add_rf = model.optimizer_step(batch, optimize_poses=True)
        losses.append(model.last_metrics["rgb_loss"])

        if not model.is_refining:
            should_refine = not ds.has_left_frames() or (
                n_added > cfg.n_overlap
                and (
                    model.get_dist_to_last_rf() > 1.0
                    or (ds.active_frames_bounds[1] - ds.active_frames_bounds[0]) >= 10
                )
            )
            if should_refine and iteration % 4 == 0:
                model.is_refining = True
            elif ds.has_left_frames() and iteration % 4 == 3:
                model.append_frame()
                ds.activate_frames()
                n_added += 1
        if can_add_rf:
            if ds.has_left_frames():
                model.append_rf(n_added)
                n_added = 0
                training_frames = model.blending_weights[:, -1] > 0
                first = int(np.argmax(training_frames))
                ds.deactivate_frames(first)
                model.set_window_start(first)
            else:
                break
        iteration += 1

    assert all(np.isfinite(losses))
    # photometric loss should drop substantially on a near-static scene
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert model.n_frames > cfg.n_init_frames
    assert len(model.fields) >= 1


def test_eval_render(setup):
    ds, cfg, model = setup
    ray_ids = np.arange(W * H, dtype=np.int64)
    view_ids = np.array([1])
    rgb, depth, dirs, ij = model.forward_eval(
        ray_ids, view_ids, W, H, chunk=W * H, test_id=False
    )
    assert rgb.shape == (W * H, 3)
    assert np.all(np.isfinite(rgb)) and np.all(np.isfinite(depth))
    assert rgb.min() >= 0 and rgb.max() <= 1


def test_pose_gates_freeze_unlinked(setup):
    ds, cfg, model = setup
    gate = model._gate()
    # gates only within window length
    assert gate.shape[0] == model._wc
    assert not gate[model.win_len:].any()


def test_cam2world_shapes(setup):
    ds, cfg, model = setup
    c2w = model.get_cam2world()
    assert c2w.shape == (model.n_frames, 3, 4)
    # rotations orthonormal
    rtr = np.einsum("bij,bik->bjk", c2w[:, :3, :3], c2w[:, :3, :3])
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (model.n_frames, 1, 1)), atol=1e-4)


def test_window_capacity_growth():
    """Appending past the 64-slot window capacity grows it in 32-steps and
    training still runs."""
    rng = np.random.default_rng(5)
    rgbs = rng.uniform(0, 1, (80, H, W, 3)).astype(np.float32)
    ds = SyntheticDataset(rgbs, "train", n_init_frames=70, test_frame_every=0,
                          frames_chunk=80)
    cfg = LocalConfig(
        fov=60.0, n_init_frames=70, WH=(W, H), n_views=4, batch_size=64,
        tensorf=TensorfConfig(grid_size=(12, 12, 12)),
        loss_flow_weight=0.0, loss_depth_weight=0.0,
    )
    model = LocalTensorfs(cfg)
    assert model._wc >= 70 and model._wc % 32 == 0
    batch = ds.sample(cfg.batch_size, False, True, n_views=cfg.n_views)
    model.optimizer_step(batch, optimize_poses=True)
    assert np.isfinite(model.last_metrics["total_loss"])
    # gates cover exactly the window
    assert model._gate().shape == (model._wc,)


def test_seed_determinism():
    """Same seed + same data -> bit-identical training trajectories."""
    results = []
    for _ in range(2):
        rng = np.random.default_rng(9)
        rgbs = rng.uniform(0, 1, (6, H, W, 3)).astype(np.float32)
        ds = SyntheticDataset(rgbs, "train", n_init_frames=5, test_frame_every=0)
        cfg = LocalConfig(
            fov=60.0, n_init_frames=5, WH=(W, H), n_views=4, batch_size=64,
            tensorf=TensorfConfig(grid_size=(12, 12, 12)),
            loss_flow_weight=0.0, loss_depth_weight=0.0,
        )
        model = LocalTensorfs(cfg)
        for _ in range(3):
            b = ds.sample(cfg.batch_size, False, True, n_views=cfg.n_views)
            model.optimizer_step(b, optimize_poses=True)
        results.append(np.asarray(model.fields[-1]["params"]["density_plane_0"]))
    np.testing.assert_array_equal(results[0], results[1])


def test_frozen_poses_config1():
    """BASELINE config #1: single field, frozen poses, photometric only —
    poses must stay bit-identical while the field trains."""
    rng = np.random.default_rng(13)
    rgbs = rng.uniform(0, 1, (5, H, W, 3)).astype(np.float32)
    ds = SyntheticDataset(rgbs, "train", n_init_frames=5, test_frame_every=0)
    cfg = LocalConfig(
        fov=60.0, n_init_frames=5, WH=(W, H), n_views=4, batch_size=64,
        tensorf=TensorfConfig(grid_size=(12, 12, 12)),
        loss_flow_weight=0.0, loss_depth_weight=0.0, lr_exposure_init=0.0,
    )
    model = LocalTensorfs(cfg)
    model.sync_window_to_host()
    r0, t0 = model.r_all.copy(), model.t_all.copy()
    p0 = np.asarray(model.fields[-1]["params"]["density_plane_0"])
    for _ in range(3):
        b = ds.sample(cfg.batch_size, False, False, n_views=cfg.n_views)
        assert not b["train_test_poses"]
        model.optimizer_step(b, optimize_poses=False)
    model.sync_window_to_host()
    np.testing.assert_array_equal(model.r_all, r0)
    np.testing.assert_array_equal(model.t_all, t0)
    assert not np.array_equal(
        np.asarray(model.fields[-1]["params"]["density_plane_0"]), p0
    )


def test_camera_prior_relative_pose_init():
    """With preprocessed poses, each appended frame is initialized from the
    previous pose composed with the prior relative transform
    (ref: local_tensorfs.py:168-173)."""
    n = 4
    rel = np.tile(np.eye(4, dtype=np.float32)[None], (n, 1, 1))
    # constant forward translation prior; rel[0] stays identity (the dataset
    # always emits an identity first relative pose, ref: localrf_dataset.py:61-63)
    rel[1:, 0, 3] = 0.1
    prior = {"rel_poses": rel, "transforms": {"fl_x": 500.0, "w": W}}
    cfg = LocalConfig(
        fov=60.0, n_init_frames=n, WH=(W, H), n_views=4, batch_size=64,
        tensorf=TensorfConfig(grid_size=(12, 12, 12)),
    )
    model = LocalTensorfs(cfg, camera_prior=prior)
    model.sync_window_to_host()
    # translations should accumulate the prior's +0.1 x-steps
    np.testing.assert_allclose(model.t_all[:, 0], 0.1 * np.arange(n), atol=1e-5)
    # focal derived from the prior transforms
    assert abs(model.init_focal - 500.0) < 1e-4


def test_pose_links_follow_spawns_any_overlap():
    """Frames appended after a spawn must link to the NEW field for every
    n_overlap — including n_overlap=6 (the production default), where the
    float cross-fade ladder used to leave a ~1e-16 residue in the retired
    blending column and nonzero()[0][0] linked every post-spawn frame to
    RF 0, freezing ALL pose optimization after the first spawn (root cause
    of the full-scale parity pose deficit). Ref: local_tensorfs.py:119-164."""
    for n_overlap in (2, 3, 5, 6, 7):
        cfg = LocalConfig(
            fov=60.0, n_init_frames=3, n_overlap=n_overlap, WH=(W, H),
            tensorf=TensorfConfig(grid_size=(12, 12, 12)),
        )
        m = LocalTensorfs(cfg)
        for _ in range(n_overlap + 2):
            m.append_frame()
        m.append_rf(n_added_frames=n_overlap)
        for _ in range(3):
            m.append_frame()
        n = m.n_frames
        assert m.pose_linked_rf[-3:] == [1, 1, 1], (
            f"n_overlap={n_overlap}: post-spawn frames linked"
            f" {m.pose_linked_rf[-3:]}, expected new field"
        )
        # retired column exactly zero on the last pre-append overlap row
        assert m.blending_weights[n - 4, 0] == 0.0, (
            f"n_overlap={n_overlap}: residue"
            f" {m.blending_weights[n - 4, 0]!r} in retired column"
        )
        # the pose gate re-enables for the newly linked frames
        gate = m._gate()
        assert gate[: m.win_len].any(), "no pose updates after spawn"
        # second spawn: links move to field 2
        m.append_rf(n_added_frames=min(3, n_overlap))
        m.append_frame()
        assert m.pose_linked_rf[-1] == 2
