"""Fused scan execution == step-at-a-time execution (same key stream)."""
import numpy as np
import pytest

from localrf_tpu.data.dataset import SyntheticDataset
from localrf_tpu.models.local import LocalConfig, LocalTensorfs
from localrf_tpu.models.tensorf import TensorfConfig

W, H = 20, 16


def _make(seed_ds=7):
    rng = np.random.default_rng(3)
    rgbs = rng.uniform(0, 1, (8, H, W, 3)).astype(np.float32)
    inv = rng.uniform(0.1, 1, (8, H, W)).astype(np.float32)
    flow = np.zeros((8, H, W, 2), np.float32)
    ones = np.ones((8, H, W), np.float32)
    ds = SyntheticDataset(
        rgbs, "train", invdepths=inv,
        fwd_flow=flow, fwd_mask=ones, bwd_flow=flow, bwd_mask=ones,
        n_init_frames=6, test_frame_every=4,
    )
    cfg = LocalConfig(
        fov=70.0,
        n_init_frames=6,
        WH=(W, H),
        n_views=4,
        batch_size=64,
        n_iters_per_frame=50,
        tensorf=TensorfConfig(grid_size=(12, 12, 12)),
    )
    return ds, cfg, LocalTensorfs(cfg)


def test_chunk_matches_stepwise():
    ds1, cfg, m1 = _make()
    ds2, _, m2 = _make()

    # identical batch sequences (datasets share the same seeded RNG stream)
    batches1 = [
        ds1.sample(cfg.batch_size, False, True, n_views=cfg.n_views) for _ in range(6)
    ]
    batches2 = [
        ds2.sample(cfg.batch_size, False, True, n_views=cfg.n_views) for _ in range(6)
    ]
    for b1, b2 in zip(batches1, batches2):
        np.testing.assert_array_equal(b1["idx"], b2["idx"])
        assert b1["train_test_poses"] == b2["train_test_poses"]

    # stepwise
    for b in batches1:
        if b["train_test_poses"]:
            m1.optimizer_step_poses_only(b)
        else:
            m1.optimizer_step(b, optimize_poses=True)

    # chunked
    m2.run_chunk(batches2, optimize_poses=True)

    assert m1.rf_iter == m2.rf_iter
    np.testing.assert_allclose(
        np.asarray(m2._pose_dev.r), np.asarray(m1._pose_dev.r), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m2._pose_dev.t), np.asarray(m1._pose_dev.t), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m2.fields[-1]["params"]["density_plane_0"]),
        np.asarray(m1.fields[-1]["params"]["density_plane_0"]),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(m2.fields[-1]["params"]["mlp"]["w1"]),
        np.asarray(m1.fields[-1]["params"]["mlp"]["w1"]),
        rtol=1e-5,
        atol=1e-6,
    )


def test_plan_chunk_breaks_at_events():
    ds, cfg, model = _make()
    model.is_refining = True
    # place an upsample event 3 joint steps ahead
    model.rf_iter[-1] = 2
    model.N_voxel_list = {4: 14**3}
    batches = model.plan_chunk(ds, True, max_len=20)
    # joint steps at rf_iter 2,3,4 -> event at pre-step iter 4 ends the chunk
    joint = [b for b in batches if not b["train_test_poses"]]
    assert len(joint) == 3


def test_run_chunk_applies_upsample():
    ds, cfg, model = _make()
    model.is_refining = True
    model.rf_iter[-1] = 2
    model.N_voxel_list = {3: 14**3}
    batches = model.plan_chunk(ds, True, max_len=10)
    model.run_chunk(batches, optimize_poses=True)
    assert model.fields[-1]["cfg"].grid_size == (14, 14, 14)


def test_run_chunk_with_mesh_matches_single_device():
    """Ray-batch DP over an 8-device CPU mesh produces the same result as
    single-device execution (params replicated, grads psum'd by GSPMD)."""
    import jax

    from localrf_tpu.parallel.sharding import make_mesh

    assert len(jax.devices()) >= 8
    ds1, cfg, m1 = _make()
    ds2, _, m2 = _make()
    m2.set_mesh(make_mesh(8))

    batches1 = [ds1.sample(cfg.batch_size, False, True, n_views=cfg.n_views) for _ in range(3)]
    batches2 = [ds2.sample(cfg.batch_size, False, True, n_views=cfg.n_views) for _ in range(3)]
    m1.run_chunk(batches1, optimize_poses=True)
    m2.run_chunk(batches2, optimize_poses=True)

    np.testing.assert_allclose(
        np.asarray(m2._pose_dev.t), np.asarray(m1._pose_dev.t), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m2.fields[-1]["params"]["density_plane_0"]),
        np.asarray(m1.fields[-1]["params"]["density_plane_0"]),
        rtol=1e-4,
        atol=1e-5,
    )


def test_forward_eval_with_mesh_matches_single_device():
    """Eval renders shard over the same data mesh as training: per-ray
    march with replicated tables is embarrassingly parallel, so outputs
    must match the single-device eval. Exercises both the one-view
    render_frame fast path and the generic multi-view chunked path."""
    import jax

    from localrf_tpu.parallel.sharding import make_mesh

    assert len(jax.devices()) >= 8
    ds, cfg, m = _make()
    batches = [ds.sample(cfg.batch_size, False, True, n_views=cfg.n_views) for _ in range(3)]
    m.run_chunk(batches, optimize_poses=True)

    all_ids = np.arange(W * H, dtype=np.int32)
    two_view_ids = np.concatenate([all_ids, all_ids])

    # single-device reference
    rgb0, dep0, _, _ = m.forward_eval(all_ids, [0], W, H)
    rgb0m, dep0m, _, _ = m.forward_eval(two_view_ids, [0, 1], W, H)

    m.set_mesh(make_mesh(8))
    m.clear_eval_cache()
    rgb1, dep1, _, _ = m.forward_eval(all_ids, [0], W, H)
    rgb1m, dep1m, _, _ = m.forward_eval(two_view_ids, [0, 1], W, H)

    np.testing.assert_allclose(rgb1, rgb0, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(dep1, dep0, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(rgb1m, rgb0m, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(dep1m, dep0m, rtol=1e-6, atol=1e-6)


def test_pooled_chunk_matches_host_batches():
    """Device-pool execution == host-batch execution (same RNG streams)."""
    from localrf_tpu.data.pool import DevicePixelPool

    ds1, cfg, m1 = _make()
    ds2, _, m2 = _make()
    m2.attach_pool(DevicePixelPool(ds2, capacity=10))

    batches1 = [ds1.sample(cfg.batch_size, False, True, n_views=cfg.n_views) for _ in range(4)]
    batches2 = [
        ds2.sample(cfg.batch_size, False, True, n_views=cfg.n_views, values=False)
        for _ in range(4)
    ]
    for b1, b2 in zip(batches1, batches2):
        np.testing.assert_array_equal(b1["idx"], b2["idx"])

    m1.run_chunk(batches1, optimize_poses=True)
    m2.run_chunk(batches2, optimize_poses=True)

    np.testing.assert_allclose(
        np.asarray(m2._pose_dev.t), np.asarray(m1._pose_dev.t), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m2.fields[-1]["params"]["density_plane_0"]),
        np.asarray(m1.fields[-1]["params"]["density_plane_0"]),
        rtol=1e-5,
        atol=1e-6,
    )


def test_pooled_chunk_with_mesh_matches_single_device():
    """Pixel pool + ray-batch DP compose (VERDICT r1 #6): pool arrays
    replicated over the 8-device mesh, index stream sharded — results match
    unpooled single-device execution."""
    import jax

    from localrf_tpu.data.pool import DevicePixelPool
    from localrf_tpu.parallel.sharding import make_mesh

    assert len(jax.devices()) >= 8
    ds1, cfg, m1 = _make()
    ds2, _, m2 = _make()
    m2.set_mesh(make_mesh(8))
    m2.attach_pool(DevicePixelPool(ds2, capacity=10))

    batches1 = [ds1.sample(cfg.batch_size, False, True, n_views=cfg.n_views) for _ in range(4)]
    batches2 = [
        ds2.sample(cfg.batch_size, False, True, n_views=cfg.n_views, values=False)
        for _ in range(4)
    ]
    m1.run_chunk(batches1, optimize_poses=True)
    m2.run_chunk(batches2, optimize_poses=True)

    np.testing.assert_allclose(
        np.asarray(m2._pose_dev.t), np.asarray(m1._pose_dev.t), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m2.fields[-1]["params"]["density_plane_0"]),
        np.asarray(m1.fields[-1]["params"]["density_plane_0"]),
        rtol=1e-4,
        atol=1e-5,
    )


def test_pool_slot_recycling():
    from localrf_tpu.data.pool import DevicePixelPool

    ds, cfg, model = _make()
    pool = DevicePixelPool(ds, capacity=8)
    pool.sync()
    assert len(pool.slot_of_frame) == ds.active_frames_bounds[1]
    # slide the window: old frames release slots, new frames claim them
    ds.activate_frames(2)
    ds.deactivate_frames(3)
    pool.sync()
    b0, b1 = ds.active_frames_bounds
    assert set(pool.slot_of_frame) == set(range(b0, b1))
