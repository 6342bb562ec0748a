"""Forward-fused gather with per-segment backwards (round 4,
ops/pallas/binned_scatter.take_rows_fwdfused) vs the per-orientation path.

The forward must be BIT-exact (same rows, same lerp); backwards match
exactly at f32 and to bf16 rounding otherwise (the per-segment scatter
accumulates in f32 where the stock XLA path may not).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localrf_tpu.models.tensorf import (
    TensorfConfig,
    build_combined_quad_views,
    compute_density_app_features,
    init_tensorf,
)

GRID = 20


def _outs(params, pts, cfg):
    quad = build_combined_quad_views(params, cfg)
    return compute_density_app_features(params, pts, cfg, quad)


def _loss(params, pts, cfg):
    s, a = _outs(params, pts, cfg)
    return jnp.sum(jnp.sin(s * 0.1)) + jnp.sum(a * a)


@pytest.mark.parametrize("mode", [1, 2])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("binned", [False, True])
def test_fwdfused_matches_per_orientation(mode, dtype, binned):
    cfg0 = TensorfConfig(
        grid_size=(GRID, GRID, GRID), gather_dtype=dtype,
        binned_scatter=binned, binned_min_rows=64,  # force the binned branch
    )
    cfg_f = dataclasses.replace(cfg0, fused_fwd_gather=mode)
    params = init_tensorf(jax.random.PRNGKey(0), cfg0)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (513, 3), jnp.float32, -0.95, 0.95)

    s0, a0 = jax.jit(lambda p: _outs(p, pts, cfg0))(params)
    s1, a1 = jax.jit(lambda p: _outs(p, pts, cfg_f))(params)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))

    g0 = jax.jit(jax.grad(lambda p: _loss(p, pts, cfg0)))(params)
    g1 = jax.jit(jax.grad(lambda p: _loss(p, pts, cfg_f)))(params)
    if dtype == "float32" and not binned:
        # mode 2's line backward runs the one-hot dot over the lane-padded
        # 128-col table: same math, different reduction tiling -> ulp-level
        tol = 0.0 if mode == 1 else 1e-5
    else:
        tol = 5e-3
    for (k, v0), (_, v1) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        scale = max(1e-3, float(jnp.max(jnp.abs(v0))))
        np.testing.assert_allclose(
            np.asarray(v1, np.float32) / scale,
            np.asarray(v0, np.float32) / scale,
            rtol=tol, atol=tol, err_msg=jax.tree_util.keystr(k),
        )


def test_fwdfused_non_cubic_and_mismatched_width_fallback():
    """Non-matching table widths must fall back to the unfused path (the
    guard), still producing identical results."""
    cfg0 = TensorfConfig(
        grid_size=(GRID, GRID, GRID), density_n_comp=(8, 8, 4),
        gather_dtype="float32",
    )
    cfg_f = dataclasses.replace(cfg0, fused_fwd_gather=2)
    params = init_tensorf(jax.random.PRNGKey(2), cfg0)
    pts = jax.random.uniform(jax.random.PRNGKey(3), (129, 3), jnp.float32, -0.9, 0.9)
    s0, a0 = _outs(params, pts, cfg0)
    s1, a1 = _outs(params, pts, cfg_f)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
