"""RAFT-JAX architecture tests: correlation volume vs naive computation,
convex upsampling invariants, end-to-end shape/finiteness, cycle masks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localrf_tpu.preprocess.raft import (
    CORR_LEVELS,
    CORR_RADIUS,
    InputPadder,
    build_corr_pyramid,
    convex_upsample,
    corr_lookup,
    init_raft,
    raft_apply,
)


def test_corr_pyramid_matches_naive(rng):
    b, h, w, d = 2, 6, 5, 16
    f1 = rng.normal(size=(b, h, w, d)).astype(np.float32)
    f2 = rng.normal(size=(b, h, w, d)).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    assert len(pyr) == CORR_LEVELS
    assert pyr[0].shape == (b * h * w, h, w, 1)
    # naive: corr[b, y1, x1, y2, x2] = <f1[b,y1,x1], f2[b,y2,x2]>/sqrt(d)
    naive = np.einsum("byxd,bzwd->byxzw", f1, f2) / np.sqrt(d)
    got = np.asarray(pyr[0]).reshape(b, h, w, h, w)
    np.testing.assert_allclose(got, naive, rtol=1e-4, atol=1e-5)


def test_corr_lookup_center_tap(rng):
    """Looking up at zero flow, the center tap equals the self-correlation."""
    b, h, w, d = 1, 8, 8, 8
    f1 = rng.normal(size=(b, h, w, d)).astype(np.float32)
    f2 = rng.normal(size=(b, h, w, d)).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = jnp.asarray(
        np.stack([xs, ys], -1)[None].astype(np.float32)
    )
    out = np.asarray(corr_lookup(pyr, coords))
    k = 2 * CORR_RADIUS + 1
    center = out[0, :, :, (k * k) // 2]  # level-0 center tap
    expected = np.einsum("yxd,yxd->yx", f1[0], f2[0]) / np.sqrt(d)
    np.testing.assert_allclose(center, expected, rtol=1e-4, atol=1e-5)


def test_convex_upsample_constant_flow(rng):
    """Convex combination of a constant flow field is that constant x8."""
    b, h, w = 1, 4, 6
    flow = np.full((b, h, w, 2), 1.5, np.float32)
    mask = rng.normal(size=(b, h, w, 9 * 64)).astype(np.float32)
    up = np.asarray(convex_upsample(jnp.asarray(flow), jnp.asarray(mask)))
    assert up.shape == (b, h * 8, w * 8, 2)
    # interior (away from zero-padded borders) must equal 8 * 1.5
    np.testing.assert_allclose(up[:, 8:-8, 8:-8], 12.0, rtol=1e-5)


@pytest.mark.slow
def test_raft_forward_shapes(rng):
    params = init_raft(jax.random.PRNGKey(0))
    h, w = 64, 80
    im1 = jnp.asarray(rng.uniform(0, 255, (2, h, w, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (2, h, w, 3)).astype(np.float32))
    flow = raft_apply(params, im1, im2, iters=2)
    assert flow.shape == (2, h, w, 2)
    assert np.all(np.isfinite(np.asarray(flow)))


def test_input_padder():
    pad = InputPadder((1, 30, 41, 3))
    x = jnp.zeros((1, 30, 41, 3))
    p = pad.pad(x)
    assert p.shape[1] % 8 == 0 and p.shape[2] % 8 == 0
    u = pad.unpad(p)
    assert u.shape == x.shape


def test_cycle_consistency_mask():
    from localrf_tpu.preprocess.run_flow import compute_fwdbwd_mask

    h, w = 16, 20
    # perfectly consistent: bwd = -fwd (zero motion field everywhere)
    fwd = np.full((h, w, 2), 2.0, np.float32)
    bwd = -fwd
    fm, bm = compute_fwdbwd_mask(fwd, bwd)
    assert fm[4:-4, 4:-4].all() and bm[4:-4, 4:-4].all()
    # wildly inconsistent flows are masked out
    bwd_bad = np.full((h, w, 2), 30.0, np.float32)
    fm2, _ = compute_fwdbwd_mask(fwd, bwd_bad)
    assert not fm2.any()


def test_run_flow_cli_end_to_end(tmp_path, monkeypatch, rng):
    """The flow preprocessing CLI writes decodable flow_ds/ + flow_vis/
    outputs (random RAFT weights via a patched checkpoint converter)."""
    import os

    cv2 = pytest.importorskip("cv2")
    from localrf_tpu.data.flow_io import decode_flow
    from localrf_tpu.preprocess import run_flow as rf

    scene = tmp_path / "scene"
    os.makedirs(scene / "images")
    for i in range(3):
        img = (rng.uniform(0, 255, (40, 48, 3))).astype(np.uint8)
        cv2.imwrite(str(scene / "images" / f"{i:06d}.jpg"), img)

    monkeypatch.setattr(
        "localrf_tpu.preprocess.convert.convert_raft_checkpoint",
        lambda path: init_raft(jax.random.PRNGKey(0)),
    )
    rf.main(["--data_dir", str(scene), "--iters", "2"])

    enc = cv2.imread(str(scene / "flow_ds" / "fwd_000001.png"), cv2.IMREAD_UNCHANGED)
    assert enc is not None and enc.dtype == np.uint16 and enc.shape[-1] == 3
    flow, mask = decode_flow(enc)
    assert np.all(np.isfinite(flow))
    assert (scene / "flow_vis" / "fwd_000001.jpg").exists()
    assert (scene / "flow_ds" / "bwd_000000.png").exists()
