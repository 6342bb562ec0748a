"""Checkpoint round-trip: full training state survives save/load and the
restored model continues training and renders identically."""
import numpy as np
import pytest

from localrf_tpu.checkpoint import load_checkpoint, save_checkpoint
from localrf_tpu.data.dataset import SyntheticDataset
from localrf_tpu.models.local import LocalConfig, LocalTensorfs
from localrf_tpu.models.tensorf import TensorfConfig

W, H = 20, 16


def _build():
    rng = np.random.default_rng(11)
    rgbs = rng.uniform(0, 1, (6, H, W, 3)).astype(np.float32)
    ds = SyntheticDataset(rgbs, "train", n_init_frames=4, test_frame_every=0)
    cfg = LocalConfig(
        fov=70.0,
        n_init_frames=4,
        WH=(W, H),
        n_views=4,
        batch_size=64,
        tensorf=TensorfConfig(grid_size=(12, 12, 12)),
        loss_flow_weight=0.0,
        loss_depth_weight=0.0,
    )
    model = LocalTensorfs(cfg)
    return ds, cfg, model


def test_checkpoint_roundtrip(tmp_path):
    ds, cfg, model = _build()
    for _ in range(5):
        batch = ds.sample(cfg.batch_size, False, True, n_views=cfg.n_views)
        model.optimizer_step(batch, optimize_poses=True)

    path = str(tmp_path / "ckpt.th")
    save_checkpoint(model, path)
    model2 = load_checkpoint(path)

    # poses identical
    np.testing.assert_allclose(model2.get_cam2world(), model.get_cam2world(), atol=1e-6)
    assert model2.n_frames == model.n_frames
    assert len(model2.fields) == len(model.fields)
    assert model2.rf_iter == model.rf_iter
    assert model2.is_refining == model.is_refining

    # renders identical
    ray_ids = np.arange(W * H, dtype=np.int64)
    rgb1, dep1, _, _ = model.forward_eval(ray_ids, np.array([1]), W, H, chunk=W * H)
    rgb2, dep2, _, _ = model2.forward_eval(ray_ids, np.array([1]), W, H, chunk=W * H)
    np.testing.assert_allclose(rgb2, rgb1, atol=1e-5)
    np.testing.assert_allclose(dep2, dep1, atol=1e-5)

    # restored model keeps training (optimizer state intact)
    batch = ds.sample(cfg.batch_size, False, True, n_views=cfg.n_views)
    model2.optimizer_step(batch, optimize_poses=True)
    assert np.isfinite(model2.last_metrics["total_loss"])
