"""Dataset semantics: windowing, sampling, flow codec, loss weights."""
import numpy as np
import pytest

from localrf_tpu.data.dataset import SyntheticDataset
from localrf_tpu.data.flow_io import decode_flow, encode_flow


def make_ds(n=20, h=8, w=10, **kw):
    rng = np.random.default_rng(0)
    rgbs = rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32)
    return SyntheticDataset(rgbs, "train", **kw), rgbs


def test_flow_codec_roundtrip(rng):
    flow = rng.uniform(-60, 60, (16, 12, 2)).astype(np.float32)
    mask = rng.uniform(size=(16, 12)) > 0.3
    enc = encode_flow(flow, mask)
    assert enc.dtype == np.uint16 and enc.shape == (16, 12, 3)
    dec_flow, dec_mask = decode_flow(enc)
    np.testing.assert_allclose(dec_flow, flow, atol=1 / 2**8 + 1e-4)
    np.testing.assert_array_equal(dec_mask > 0, mask)


def test_window_activate_deactivate():
    ds, rgbs = make_ds(n_init_frames=5, test_frame_every=0, frames_chunk=6)
    assert ds.active_frames_bounds == [0, 5]
    assert ds.loaded_frames >= 5
    ds.activate_frames(3)
    assert ds.active_frames_bounds == [0, 8]
    n_px = ds.n_px_per_frame
    total_before = ds.all_rgbs.shape[0]
    ds.deactivate_frames(2)
    assert ds.active_frames_bounds == [2, 8]
    assert ds.all_rgbs.shape[0] == total_before - 2 * n_px
    # content alignment: first remaining pixel belongs to frame 2
    np.testing.assert_allclose(
        ds.all_rgbs[0], rgbs[2].reshape(-1, 3)[0], atol=1e-6
    )


def test_sample_batch_shapes_and_ranges():
    ds, _ = make_ds(n_init_frames=8, test_frame_every=4)
    batch = ds.sample(64, is_refining=True, optimize_poses=False, n_views=4)
    assert batch["rgbs"].shape == (64, 3)
    assert batch["view_ids"].shape == (4,)
    assert not batch["train_test_poses"]
    b0, b1 = ds.active_frames_bounds
    assert np.all(batch["view_ids"] >= b0) and np.all(batch["view_ids"] < b1)
    # train mode excludes test frames
    assert all(ds.test_mask[v] == 0 for v in batch["view_ids"])
    # ray ids encode the view
    views_from_idx = batch["idx"] // ds.n_px_per_frame
    np.testing.assert_array_equal(
        views_from_idx.reshape(4, -1)[:, 0], batch["view_ids"]
    )


def test_sample_forces_newest_views_when_coarse():
    ds, _ = make_ds(n_init_frames=10, test_frame_every=0)
    batch = ds.sample(96, is_refining=False, optimize_poses=False, n_views=6)
    v = batch["view_ids"]
    assert set(v[:6].tolist()) == {9, 9, 8, 8, 7, 6}


def test_test_split_takes_every_kth():
    rng = np.random.default_rng(0)
    rgbs = rng.uniform(0, 1, (20, 8, 10, 3)).astype(np.float32)
    ds = SyntheticDataset(rgbs, "test", test_frame_every=5)
    assert ds.num_images == 4  # frames 0, 5, 10, 15


def test_train_test_poses_sampling_probability():
    ds, _ = make_ds(n_init_frames=20, test_frame_every=4)
    hits = sum(
        ds.sample(16, True, optimize_poses=True, n_views=4)["train_test_poses"]
        for _ in range(300)
    )
    # active test ratio is 5/20 = 0.25; allow generous tolerance
    assert 0.1 < hits / 300 < 0.45
    # and when sampling test poses, only test frames are drawn
    for _ in range(50):
        b = ds.sample(16, True, optimize_poses=True, n_views=4)
        if b["train_test_poses"]:
            assert all(ds.test_mask[v] == 1 for v in b["view_ids"])
            break
