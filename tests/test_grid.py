"""Parity tests: XLA grid sampling vs torch.nn.functional.grid_sample
(align_corners=True, border padding) — the exact op the reference relies on."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from localrf_tpu.ops import grid as lg


def test_grid_sample_2d_matches_torch(rng):
    c, h, w, p = 8, 37, 53, 501
    plane = rng.normal(size=(c, h, w)).astype(np.float32)
    coords = rng.uniform(-1.3, 1.3, (p, 2)).astype(np.float32)  # incl. out of range

    ours = np.asarray(lg.grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords)))

    ref = F.grid_sample(
        torch.from_numpy(plane)[None],
        torch.from_numpy(coords).view(1, -1, 1, 2),
        align_corners=True,
        padding_mode="border",
    ).numpy()[0, :, :, 0].T  # [P, C]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_1d_matches_torch(rng):
    c, d, p = 24, 129, 401
    line = rng.normal(size=(c, d)).astype(np.float32)
    coords = rng.uniform(-1.2, 1.2, (p,)).astype(np.float32)

    ours = np.asarray(lg.grid_sample_1d(jnp.asarray(line), jnp.asarray(coords)))

    # reference samples lines as [1, C, D, 1] grids at (x=0, y=coord)
    grid = torch.stack(
        [torch.zeros(p), torch.from_numpy(coords)], dim=-1
    ).view(1, -1, 1, 2)
    ref = F.grid_sample(
        torch.from_numpy(line)[None, :, :, None],
        grid,
        align_corners=True,
        padding_mode="border",
    ).numpy()[0, :, :, 0].T
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_matches_torch(rng):
    d, h, w, p = 19, 23, 29, 301
    vol = rng.uniform(0, 1, (d, h, w)).astype(np.float32)
    coords = rng.uniform(-1.2, 1.2, (p, 3)).astype(np.float32)

    ours = np.asarray(lg.grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords)))

    ref = F.grid_sample(
        torch.from_numpy(vol)[None, None],
        torch.from_numpy(coords).view(1, -1, 1, 1, 3),
        align_corners=True,
        padding_mode="border",
    ).numpy().reshape(-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_resize_2d_matches_torch_interpolate(rng):
    c, h, w = 8, 21, 17
    plane = rng.normal(size=(c, h, w)).astype(np.float32)
    nh, nw = 47, 33
    ours = np.asarray(lg.resize_align_corners_2d(jnp.asarray(plane), nh, nw))
    ref = F.interpolate(
        torch.from_numpy(plane)[None], size=(nh, nw), mode="bilinear", align_corners=True
    ).numpy()[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_resize_1d_matches_torch_interpolate(rng):
    c, d = 8, 33
    line = rng.normal(size=(c, d)).astype(np.float32)
    nd = 77
    ours = np.asarray(lg.resize_align_corners_1d(jnp.asarray(line), nd))
    ref = F.interpolate(
        torch.from_numpy(line)[None, :, :, None],
        size=(nd, 1),
        mode="bilinear",
        align_corners=True,
    ).numpy()[0, :, :, 0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_quad_plane_matches_grid_sample(rng):
    import jax.numpy as jnp
    c, h, w, p = 8, 37, 53, 501
    plane = rng.normal(size=(c, h, w)).astype(np.float32)
    coords = rng.uniform(-1.3, 1.3, (p, 2)).astype(np.float32)
    quad = lg.build_quad_plane(jnp.asarray(plane))
    assert quad.shape == (h * w, 4 * c)  # small table: no lane padding
    fast = np.asarray(lg.quad_sample_2d(quad, h, w, jnp.asarray(coords), c))
    ref = np.asarray(lg.grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords)))
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-5)


def test_quad_line_matches_grid_sample(rng):
    import jax.numpy as jnp
    c, d, p = 24, 129, 401
    line = rng.normal(size=(c, d)).astype(np.float32)
    coords = rng.uniform(-1.2, 1.2, (p,)).astype(np.float32)
    quad = lg.build_quad_line(jnp.asarray(line))
    assert quad.shape == (d, 2 * c)
    fast = np.asarray(lg.quad_sample_1d(quad, d, jnp.asarray(coords), c))
    ref = np.asarray(lg.grid_sample_1d(jnp.asarray(line), jnp.asarray(coords)))
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-5)


def test_quad_gradients_match(rng):
    """Grad w.r.t. the canonical plane must be identical through both paths."""
    import jax
    import jax.numpy as jnp
    c, h, w, p = 4, 11, 13, 100
    plane = jnp.asarray(rng.normal(size=(c, h, w)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (p, 2)).astype(np.float32))

    g_ref = jax.grad(lambda pl: jnp.sum(lg.grid_sample_2d(pl, coords) ** 2))(plane)
    g_fast = jax.grad(
        lambda pl: jnp.sum(lg.quad_sample_2d(lg.build_quad_plane(pl), h, w, coords, c) ** 2)
    )(plane)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
