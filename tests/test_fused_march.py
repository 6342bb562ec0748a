"""Fused Pallas march core (ops/pallas/march.py) vs the default XLA path.

Runs in interpret mode on the CPU test backend. Checks forward values and
every gradient group (plane rows via the table params, line tables, basis,
MLP params, and the pose-gradient carriers wx/wy/w1) against the existing
compute_density_app_features + apply_mlp composition, plus an end-to-end
render_rays comparison with the flag on vs off.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localrf_tpu.models.render import render_rays
from localrf_tpu.models.tensorf import (
    TensorfConfig,
    apply_mlp,
    build_combined_quad_views,
    compute_density_app_features,
    init_tensorf,
)
from localrf_tpu.ops.pallas.march import (
    fused_march_features,
    fused_march_supported,
)

GRID = 24


def _setup(dtype="float32", seed=0):
    cfg = TensorfConfig(
        grid_size=(GRID, GRID, GRID),
        gather_dtype=dtype,
        mlp_dtype=dtype,
        fused_march=True,
    )
    params = init_tensorf(jax.random.PRNGKey(seed), cfg)
    key = jax.random.PRNGKey(seed + 1)
    pts = jax.random.uniform(key, (777, 3), jnp.float32, -0.99, 0.99)
    vd = jax.random.normal(jax.random.PRNGKey(seed + 2), (777, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    return cfg, params, pts, vd


def _reference_path(params, pts, vd, cfg):
    quad = build_combined_quad_views(params, cfg)
    sigma, app = compute_density_app_features(params, pts, cfg, quad)
    rgb = apply_mlp(params["mlp"], pts, jax.lax.stop_gradient(vd), app, cfg, 1.0)
    return sigma, rgb


def _fused_path(params, pts, vd, cfg):
    quad = build_combined_quad_views(params, cfg)
    return fused_march_features(
        params, quad, pts, jax.lax.stop_gradient(vd), cfg
    )


def test_supported_guard():
    cfg, *_ = _setup()
    assert fused_march_supported(cfg)
    assert not fused_march_supported(
        TensorfConfig(grid_size=(GRID, GRID, GRID), shading_mode="MLP_Fea")
    )
    assert not fused_march_supported(
        TensorfConfig(grid_size=(16, 24, 24))
    )


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_forward_parity(dtype):
    cfg, params, pts, vd = _setup(dtype)
    s_ref, rgb_ref = jax.jit(lambda p: _reference_path(p, pts, vd, cfg))(params)
    s_f, rgb_f = jax.jit(lambda p: _fused_path(p, pts, vd, cfg))(params)
    tol = 1e-5 if dtype == "float32" else 2e-2
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_ref), rtol=tol, atol=tol)
    np.testing.assert_allclose(
        np.asarray(rgb_f), np.asarray(rgb_ref), rtol=tol, atol=tol
    )


@pytest.mark.slow
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_grad_parity_params(dtype):
    """Gradients w.r.t. every canonical parameter group (planes and lines
    flow through the derived quad views; basis/MLP direct)."""
    cfg, params, pts, vd = _setup(dtype)

    def loss(fn):
        def f(p):
            sigma, rgb = fn(p, pts, vd, cfg)
            return jnp.sum(jnp.sin(sigma * 0.1)) + jnp.sum(rgb * rgb)

        return f

    g_ref = jax.jit(jax.grad(loss(_reference_path)))(params)
    g_f = jax.jit(jax.grad(loss(_fused_path)))(params)
    tol = 5e-4 if dtype == "float32" else 6e-2
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_f)
    )
    for k, v_ref in flat_ref:
        ks = jax.tree_util.keystr(k)
        v_f = flat_f[ks]
        scale = max(1e-3, float(jnp.max(jnp.abs(v_ref))))
        np.testing.assert_allclose(
            np.asarray(v_f, np.float32) / scale,
            np.asarray(v_ref, np.float32) / scale,
            rtol=tol, atol=tol, err_msg=ks,
        )


def test_grad_parity_points():
    """The pose-gradient path: d loss / d pts must match (flows through the
    lerp weights wx/wy/w1 and the texel indices' straight-through zeros)."""
    cfg, params, pts, vd = _setup("float32")

    def loss(fn):
        def f(q):
            sigma, rgb = fn(params, q, vd, cfg)
            return jnp.sum(jnp.tanh(sigma * 0.1)) + jnp.sum(rgb)

        return f

    g_ref = jax.jit(jax.grad(loss(_reference_path)))(pts)
    g_f = jax.jit(jax.grad(loss(_fused_path)))(pts)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_ref), rtol=5e-4, atol=5e-4
    )


def test_render_rays_end_to_end():
    """Flag on vs off through the full renderer (dense path, no alpha)."""
    import dataclasses

    cfg, params, _, _ = _setup("float32")
    key = jax.random.PRNGKey(3)
    rays_o = jax.random.uniform(key, (64, 3), jnp.float32, -0.3, 0.3)
    rays_d = jax.random.normal(jax.random.PRNGKey(4), (64, 3))

    def run(c):
        return render_rays(
            params, c, rays_o, rays_d, is_train=False, white_bg=True,
        )

    rgb_on, dep_on = jax.jit(lambda: run(cfg))()
    rgb_off, dep_off = jax.jit(
        lambda: run(dataclasses.replace(cfg, fused_march=False))
    )()
    np.testing.assert_allclose(
        np.asarray(rgb_on), np.asarray(rgb_off), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(dep_on), np.asarray(dep_off), rtol=2e-5, atol=2e-5
    )
