import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localrf_tpu.ops import math as lm


def test_contract_inside_unit_ball_identity(rng):
    x = rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32)
    out = np.asarray(lm.contract(jnp.asarray(x)))
    np.testing.assert_allclose(out, x, rtol=1e-6)


def test_contract_outside_maps_to_bounded(rng):
    x = rng.uniform(-50, 50, (256, 3)).astype(np.float32)
    out = np.asarray(lm.contract(jnp.asarray(x)))
    assert np.all(np.abs(out) <= 2.0 + 1e-5)
    # direction preserved
    dots = np.sum(out * x, axis=-1)
    assert np.all(dots >= 0)


def test_contract_formula(rng):
    x = rng.uniform(-5, 5, (128, 3)).astype(np.float32)
    n = np.clip(np.max(np.abs(x), axis=-1, keepdims=True), 1e-6, None)
    expected = np.where(n <= 1, x, ((2 * n - 1) / n**2) * x)
    out = np.asarray(lm.contract(jnp.asarray(x)))
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_sixd_roundtrip(rng):
    # random rotations via QR
    a = rng.normal(size=(32, 3, 3)).astype(np.float32)
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diagonal(r, axis1=-2, axis2=-1))[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 2] *= -1  # make proper rotations
    six = np.asarray(lm.mtx_to_sixD(jnp.asarray(q)))
    back = np.asarray(lm.sixD_to_mtx(jnp.asarray(six)))
    np.testing.assert_allclose(back, q, rtol=1e-4, atol=1e-5)


def test_sixd_orthonormal(rng):
    r = rng.normal(size=(16, 3, 2)).astype(np.float32)
    m = np.asarray(lm.sixD_to_mtx(jnp.asarray(r)))
    eye = np.einsum("bij,bik->bjk", m, m)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_alpha2weights_matches_manual(rng):
    alpha = rng.uniform(0, 1, (8, 16)).astype(np.float32)
    w, t = lm.alpha2weights(jnp.asarray(alpha))
    w, t = np.asarray(w), np.asarray(t)
    a = alpha.copy()
    a[:, -1] = 1.0
    tm = np.cumprod(
        np.concatenate([np.ones((8, 1), np.float32), 1 - a + 1e-10], axis=-1), axis=-1
    )
    np.testing.assert_allclose(w, a * tm[:, :-1], rtol=1e-5)
    # weights sum to 1 because of the opaque terminator
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)


def test_inverse_pose(rng):
    r = np.asarray(lm.sixD_to_mtx(jnp.asarray(rng.normal(size=(8, 3, 2)).astype(np.float32))))
    t = rng.normal(size=(8, 3)).astype(np.float32)
    pose = np.concatenate([r, t[..., None]], axis=-1)
    inv = np.asarray(lm.inverse_pose(jnp.asarray(pose)))
    # compose: R_inv @ (R x + t) + t_inv == x
    x = rng.normal(size=(8, 3)).astype(np.float32)
    y = np.einsum("bij,bj->bi", r, x) + t
    back = np.einsum("bij,bj->bi", inv[:, :3, :3], y) + inv[:, :3, 3]
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_cam2cams_transform_chain(rng):
    r = np.asarray(lm.sixD_to_mtx(jnp.asarray(rng.normal(size=(5, 3, 2)).astype(np.float32))))
    t = rng.normal(size=(5, 3)).astype(np.float32)
    c2w = np.concatenate([r, t[..., None]], axis=-1)
    idx = jnp.asarray([0, 1, 2, 3])
    fwd = np.asarray(lm.get_cam2cams(jnp.asarray(c2w), idx, 1))
    # A point at camera-i origin maps to cam i+1 coords of that same world point
    for k in range(4):
        world = t[k]
        expected = r[k + 1].T @ (world - t[k + 1])
        np.testing.assert_allclose(fwd[k, :3, 3], expected, atol=1e-5)


def test_pts2px_projection():
    pts = jnp.asarray([[[1.0, 2.0, -4.0]]])
    f = 100.0
    center = jnp.asarray([50.0, 60.0])
    out = np.asarray(lm.pts2px(pts, f, center))[0, 0]
    # x/z*f + cx - 0.5 ; y flipped then z flipped
    np.testing.assert_allclose(out, [1.0 / 4.0 * 100 + 49.5, -2.0 / 4.0 * 100 + 59.5], rtol=1e-6)


def test_depth_loss_invariance(rng):
    d = rng.uniform(1, 10, (4, 64)).astype(np.float32)
    gt = rng.uniform(0.1, 1, (4, 64)).astype(np.float32)
    _, _, base = lm.compute_depth_loss(jnp.asarray(d), jnp.asarray(gt))
    # scale/shift the prediction: loss unchanged
    _, _, scaled = lm.compute_depth_loss(jnp.asarray(3.5 * d + 2.0), jnp.asarray(gt))
    np.testing.assert_allclose(np.asarray(base), np.asarray(scaled), rtol=1e-3, atol=1e-4)


def test_tv_loss_manual(rng):
    x = rng.normal(size=(2, 3, 5, 7)).astype(np.float32)
    out = float(lm.tv_loss(jnp.asarray(x)))
    manual = 2 * (
        ((x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2).mean()
        + ((x[:, :, :, 1:] - x[:, :, :, :-1]) ** 2).mean()
    )
    np.testing.assert_allclose(out, manual, rtol=1e-5)


def test_n_to_reso_cube():
    aabb = np.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    assert lm.n_to_reso(64**3, aabb) == [64, 64, 64]
    assert lm.n_to_reso(640**3, aabb) == [640, 640, 640]


def test_pred_flow_zero_motion(rng):
    # identity cam2cam => predicted flow is ~0 when projecting the same points
    v, p = 2, 32
    f = 100.0
    center = jnp.asarray([32.0, 24.0])
    ij = rng.uniform(0, 63, (v, p, 2)).astype(np.float32)
    # build camera-space pts consistent with pixels ij at depth z
    z = rng.uniform(1, 5, (v, p)).astype(np.float32)
    x = (ij[..., 0] + 0.5 - 32.0) / f * z
    y = -(ij[..., 1] + 0.5 - 24.0) / f * z
    pts = np.stack([x, y, -z], axis=-1)
    eye = np.tile(np.concatenate([np.eye(3), np.zeros((3, 1))], -1)[None], (v, 1, 1)).astype(np.float32)
    flow = np.asarray(
        lm.get_pred_flow(jnp.asarray(pts), jnp.asarray(ij), jnp.asarray(eye), f, center)
    )
    np.testing.assert_allclose(flow, 0.0, atol=1e-3)
