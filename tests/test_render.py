"""End-to-end volume-render parity vs an independent torch oracle that
implements the reference math (contracted sampling, plane x line features,
softplus density, alpha compositing, late-view MLP shading).

Deterministic path only (is_train=False, white_bg=True) so no RNG is involved.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from localrf_tpu.models.render import render_rays
from localrf_tpu.models.tensorf import (
    MAT_MODE,
    VEC_MODE,
    TensorfConfig,
    init_tensorf,
    update_alpha_volume,
)

GRID = (18, 14, 22)
CFG = TensorfConfig(grid_size=GRID)


def torch_oracle_forward(params, rays_o, rays_d, n_total, cfg, alpha_volume=None):
    """Reference-math forward in torch (float64 for a tight oracle)."""
    t = {k: torch.from_numpy(np.asarray(v)).double() for k, v in params.items() if k != "mlp"}
    mlp = {k: torch.from_numpy(np.asarray(v)).double() for k, v in params["mlp"].items()}
    o = torch.from_numpy(rays_o).double()
    d = torch.from_numpy(rays_d).double()

    dnorm = torch.norm(d, dim=-1, keepdim=True)
    vdir = d / dnorm

    n = n_total // 6
    t_vals = torch.arange(n, dtype=torch.float64)[None] / n
    near, far = 1.0, 1e3
    z = torch.cat([t_vals, 1.0 / (1.0 / near * (1 - t_vals) + 1.0 / far * t_vals)], 1)
    z = z + 0.1
    pts = o[:, None, :] + vdir[:, None, :] * z[..., None]
    # contract
    xn = torch.clamp(pts.abs().amax(dim=-1, keepdim=True), 1e-6)
    pts = torch.where(xn <= 1, pts, ((2 * xn - 1) / xn**2) * pts)
    pts_n = pts / 2.0  # aabb [-2,2]^3 normalization

    r, s = pts_n.shape[0], pts_n.shape[1]
    flat = pts_n.reshape(-1, 3)

    def gs2(plane, coords):
        return F.grid_sample(
            plane[None], coords.view(1, -1, 1, 2), align_corners=True, padding_mode="border"
        )[0, :, :, 0]

    def gs1(line, coords):
        g = torch.stack([torch.zeros_like(coords), coords], -1)
        return F.grid_sample(
            line[None, :, :, None], g.view(1, -1, 1, 2), align_corners=True, padding_mode="border"
        )[0, :, :, 0]

    sigma_feat = torch.zeros(flat.shape[0], dtype=torch.float64)
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        pf = gs2(t[f"density_plane_{i}"], flat[:, [m0, m1]])
        lf = gs1(t[f"density_line_{i}"], flat[:, v])
        sigma_feat = sigma_feat + (pf * lf).sum(0)
    sigma = F.softplus(sigma_feat + cfg.density_shift).reshape(r, s)

    if alpha_volume is not None:
        av = torch.from_numpy(np.asarray(alpha_volume)).double()
        occ = F.grid_sample(
            av[None, None], flat.view(1, -1, 1, 1, 3), align_corners=True
        ).reshape(r, s)
        sigma = torch.where(occ > 0, sigma, torch.zeros_like(sigma))

    sigma[:, -1] = 0
    dists = torch.cat([z[:, 1:] - z[:, :-1], torch.zeros_like(z[:, :1])], -1)
    alpha = 1 - torch.exp(-sigma * dists * cfg.distance_scale)
    alpha[:, -1] = 1
    trans = torch.cumprod(
        torch.cat([torch.ones(r, 1, dtype=torch.float64), 1 - alpha + 1e-10], -1), -1
    )
    weight = alpha * trans[:, :-1]
    acc = weight.sum(-1)
    depth = (weight * z).sum(-1) / dnorm[:, 0]

    # appearance
    prods = []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        pf = gs2(t[f"app_plane_{i}"], flat[:, [m0, m1]])
        lf = gs1(t[f"app_line_{i}"], flat[:, v])
        prods.append(pf * lf)
    app = torch.cat(prods, 0).T @ t["basis_mat"]

    h = torch.relu(app @ mlp["w1"] + mlp["b1"])
    h = torch.relu(h @ mlp["w2"] + mlp["b2"])
    vd_exp = vdir[:, None, :].expand(r, s, 3).reshape(-1, 3)
    h = torch.cat([h, vd_exp], -1)
    rgb = torch.sigmoid(h @ mlp["w3"] + mlp["b3"]).reshape(r, s, 3)
    rgb = torch.where(
        (weight > cfg.ray_march_weight_thres)[..., None], rgb, torch.zeros_like(rgb)
    )
    rgb_map = (weight[..., None] * rgb).sum(-2) + (1 - acc[..., None])
    return rgb_map.numpy(), depth.numpy()


@pytest.fixture(scope="module")
def field():
    return init_tensorf(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(7)
    o = rng.uniform(-0.5, 0.5, (33, 3)).astype(np.float32)
    d = rng.normal(size=(33, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True) * rng.uniform(0.8, 1.4, (33, 1))
    return o, d.astype(np.float32)


def test_forward_matches_oracle(field, rays):
    o, d = rays
    n_total = 48
    rgb, depth = render_rays(
        field, CFG, jnp.asarray(o), jnp.asarray(d),
        is_train=False, white_bg=True, n_samples=n_total,
    )
    rgb_ref, depth_ref = torch_oracle_forward(field, o, d, n_total, CFG)
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(depth), depth_ref, rtol=1e-3, atol=2e-4)


def test_forward_with_alpha_mask(field, rays):
    o, d = rays
    vol = update_alpha_volume(field, CFG, (10, 12, 9))
    assert vol.shape == (9, 12, 10)  # [z, y, x]
    rgb, depth = render_rays(
        field, CFG, jnp.asarray(o), jnp.asarray(d),
        is_train=False, white_bg=True, n_samples=48, alpha_volume=vol,
    )
    rgb_ref, depth_ref = torch_oracle_forward(
        field, o, d, 48, CFG, alpha_volume=vol
    )
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref, rtol=1e-3, atol=2e-4)


def test_empty_field_terminator_semantics():
    """With ~zero density everywhere, the opaque far-sample terminator
    (alpha[:, -1] forced to 1) receives all the weight: output is the MLP's
    shaded color of the final sample, the composited weights sum to 1, and the
    output stays in [0, 1] — matching the reference's alpha2weights contract
    (ref: models/tensorBase.py:23-32)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, density_shift=-30.0)
    params = init_tensorf(jax.random.PRNGKey(1), cfg)
    for i in range(3):
        params[f"density_plane_{i}"] = jnp.zeros_like(params[f"density_plane_{i}"])
    o = jnp.zeros((4, 3))
    d = jnp.asarray([[0, 0, -1.0]] * 4)
    rgb, depth = render_rays(params, cfg, o, d, is_train=False, white_bg=True, n_samples=48)
    assert np.all(np.isfinite(np.asarray(rgb)))
    assert float(jnp.min(rgb)) >= 0.0 and float(jnp.max(rgb)) <= 1.0 + 1e-5
    # depth ~ the last disparity sample's z: with N=8 disparity samples the
    # deepest lands at 1/(1/8 + 7/8000) + 0.1 ~ 8.04
    assert float(jnp.min(depth)) > 5.0


def test_train_mode_runs_and_grads_flow(field, rays):
    o, d = rays

    def loss_fn(p):
        rgb, depth = render_rays(
            p, CFG, jnp.asarray(o), jnp.asarray(d),
            is_train=True, white_bg=False, n_samples=48,
            key=jax.random.PRNGKey(3),
        )
        return jnp.mean(rgb**2) + jnp.mean(depth**2) * 1e-3

    grads = jax.grad(loss_fn)(field)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # density lines must receive gradient
    assert float(jnp.sum(jnp.abs(grads["density_line_0"]))) > 0
    assert float(jnp.sum(jnp.abs(grads["mlp"]["w3"]))) > 0


def test_floater_thresh_changes_output(field, rays):
    o, d = rays
    rgb0, _ = render_rays(
        field, CFG, jnp.asarray(o), jnp.asarray(d),
        is_train=False, white_bg=True, n_samples=48, floater_thresh=0.0,
    )
    rgb1, _ = render_rays(
        field, CFG, jnp.asarray(o), jnp.asarray(d),
        is_train=False, white_bg=True, n_samples=48, floater_thresh=0.9,
    )
    assert rgb0.shape == rgb1.shape  # and it runs; outputs may differ


@pytest.mark.parametrize(
    "mode,pe",
    [
        ("MLP_Fea", dict(fea_pe=2, view_pe=2)),
        ("MLP_Fea_woView", dict(fea_pe=2)),
        ("MLP_PE", dict(pos_pe=2, view_pe=2)),
        ("MLP", dict(view_pe=2)),
        ("MLP_Fea_late_view", dict(fea_pe=2, view_pe=2)),
    ],
)
def test_shading_mode_variants(mode, pe, rays):
    """All reference shading variants run and produce valid outputs
    (ref: models/tensorBase.py:64-229, 289-315)."""
    import dataclasses

    o, d = rays
    cfg = dataclasses.replace(CFG, shading_mode=mode, **pe)
    params = init_tensorf(jax.random.PRNGKey(2), cfg)
    rgb, depth = render_rays(
        params, cfg, jnp.asarray(o), jnp.asarray(d),
        is_train=False, white_bg=True, n_samples=48,
    )
    assert rgb.shape == (33, 3)
    assert np.all(np.isfinite(np.asarray(rgb)))
    assert float(jnp.min(rgb)) >= 0.0 and float(jnp.max(rgb)) <= 1.0 + 1e-5


def test_rgb_shading_mode(rays):
    import dataclasses

    o, d = rays
    cfg = dataclasses.replace(CFG, shading_mode="RGB", app_dim=3)
    params = init_tensorf(jax.random.PRNGKey(2), cfg)
    rgb, _ = render_rays(
        params, cfg, jnp.asarray(o), jnp.asarray(d),
        is_train=False, white_bg=True, n_samples=48,
    )
    assert np.all(np.isfinite(np.asarray(rgb)))


def test_dense_alpha_slab_path_bit_exact():
    """The slab-chunked dense alpha eval (round 4: an unchunked 640^3
    lattice OOMs — found by the full-scale parity run) must be bit-exact
    vs the all-at-once path."""
    import jax

    import localrf_tpu.models.tensorf as tf_mod
    from localrf_tpu.models.tensorf import (
        TensorfConfig,
        compute_dense_alpha,
        init_tensorf,
    )

    cfg = TensorfConfig(grid_size=(24, 24, 24))
    params = init_tensorf(jax.random.PRNGKey(0), cfg)
    a0 = compute_dense_alpha(params, cfg, (24, 20, 22))
    orig = tf_mod._DENSE_ALPHA_CHUNK_PTS
    tf_mod._DENSE_ALPHA_CHUNK_PTS = 100
    try:
        a1 = compute_dense_alpha(params, cfg, (24, 20, 22))
    finally:
        tf_mod._DENSE_ALPHA_CHUNK_PTS = orig
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_density_l1_streamed_matches_dense():
    """Blockwise density_l1 must match the dense outer-product path in value
    AND gradient (only the mean's f32 accumulation order differs), on cubic
    and non-cubic commensurate grids, across multiple block counts."""
    import localrf_tpu.models.tensorf as tf_mod
    from localrf_tpu.models.tensorf import (
        TensorfConfig,
        _density_l1_streamed,
        _l1_block_size,
        density_l1,
        init_tensorf,
    )

    for grid in ((24, 24, 24), (8, 16, 32)):
        cfg = TensorfConfig(grid_size=grid)
        params = init_tensorf(jax.random.PRNGKey(3), cfg)
        n_vox = int(np.prod(grid))
        dense_fn = lambda p: density_l1(p, cfg)  # MIN_VOX keeps this dense

        d_sizes = [params[f"density_line_{i}"].shape[1] for i in range(3)]
        for target in (n_vox, 2048, max(d_sizes)):
            blk = _l1_block_size(d_sizes, n_vox, target=target)
            assert blk > 0 and n_vox % blk == 0
            stream_fn = lambda p: _density_l1_streamed(p, cfg, n_vox, blk)
            v0, g0 = jax.value_and_grad(dense_fn)(params)
            v1, g1 = jax.value_and_grad(stream_fn)(params)
            np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
            for k in g0:
                if k == "mlp":
                    continue
                np.testing.assert_allclose(
                    np.asarray(g1[k]), np.asarray(g0[k]), rtol=2e-4, atol=1e-7,
                    err_msg=f"grid={grid} target={target} key={k}",
                )

    # the dispatcher itself: force streaming via the module threshold
    cfg = TensorfConfig(grid_size=(24, 24, 24))
    params = init_tensorf(jax.random.PRNGKey(4), cfg)
    v_dense = float(density_l1(params, cfg))
    orig = tf_mod._L1_STREAM_MIN_VOX
    tf_mod._L1_STREAM_MIN_VOX = 1
    try:
        v_stream = float(density_l1(params, cfg))
    finally:
        tf_mod._L1_STREAM_MIN_VOX = orig
    np.testing.assert_allclose(v_stream, v_dense, rtol=1e-5)
