"""Fused multi-orientation plane gather (tensorf.fused_plane_gather) vs the
per-orientation path: values and gradients must be identical — the fusion
only batches the 3 tables' rows into one dispatch with static row offsets
(ref math: the per-plane F.grid_sample calls of models/tensoRF.py:135-191).

Runs on the CPU test backend; the binned-backward variant exercises the
Pallas kernel in interpret mode."""
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

# non-cubic grid: the 3 plane tables have different row counts, so the
# fused path's static offsets are actually exercised
GRID = (18, 14, 22)


def _features(params, cfg, pts):
    quad = build_combined_quad_views(params, cfg)
    return compute_density_app_features(params, pts, cfg, quad)


@pytest.mark.slow
@pytest.mark.parametrize("binned", [False, True], ids=["plain", "binned"])
@pytest.mark.parametrize("gather_dtype", ["float32", "bfloat16"])
def test_fused_matches_per_orientation(rng, binned, gather_dtype):
    base = TensorfConfig(
        grid_size=GRID,
        gather_dtype=gather_dtype,
        # binned_min_rows=1 forces the binned backward even on tiny tables
        binned_scatter=binned,
        binned_min_rows=1 if binned else 10**9,
    )
    params = init_tensorf(jax.random.PRNGKey(0), base)
    pts = jnp.asarray(rng.uniform(-1.1, 1.1, size=(257, 3)), jnp.float32)

    def run(fused):
        cfg = dataclasses.replace(base, fused_plane_gather=fused)

        def loss(p):
            sigma, app = _features(p, cfg, pts)
            return jnp.sum(sigma) + jnp.sum(app * app), (sigma, app)

        (val, (sigma, app)), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return sigma, app, grads

    s0, a0, g0 = run(False)
    s1, a1, g1 = run(True)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    for k in g0:
        if k == "mlp":
            continue
        ref, got = np.asarray(g0[k]), np.asarray(g1[k])
        # binned backward accumulates per-tile on the (emulated) MXU in a
        # different order than XLA's sort-based emitter — bitwise equality
        # holds for the plain path, tight tolerance for binned
        if binned:
            np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6, err_msg=k)
        else:
            np.testing.assert_array_equal(got, ref, err_msg=k)


@pytest.mark.parametrize("gather_dtype", ["float32", "bfloat16"])
def test_fused_line_matches_per_orientation(rng, gather_dtype):
    """fused_line_gather batches the 3 line tables' indices into one gather
    with static row offsets; the backward slices the cotangent into 3
    per-orientation one-hot matmuls with exactly the unfused dot shapes —
    values AND gradients must be bit-identical."""
    base = TensorfConfig(
        grid_size=GRID, gather_dtype=gather_dtype, line_bwd="onehot"
    )
    params = init_tensorf(jax.random.PRNGKey(2), base)
    pts = jnp.asarray(rng.uniform(-1.1, 1.1, size=(193, 3)), jnp.float32)

    def run(fused):
        cfg = dataclasses.replace(base, fused_line_gather=fused)

        def loss(p):
            sigma, app = _features(p, cfg, pts)
            return jnp.sum(sigma) + jnp.sum(app * app), (sigma, app)

        (val, (sigma, app)), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return sigma, app, grads

    s0, a0, g0 = run(False)
    s1, a1, g1 = run(True)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    for k in g0:
        if k == "mlp":
            continue
        np.testing.assert_array_equal(
            np.asarray(g0[k]), np.asarray(g1[k]), err_msg=k
        )


def test_fused_line_requires_onehot_mode(rng):
    """line_bwd='gather' -> the fused line path must silently fall back."""
    base = TensorfConfig(grid_size=GRID, line_bwd="gather")
    params = init_tensorf(jax.random.PRNGKey(3), base)
    pts = jnp.asarray(rng.uniform(-1.0, 1.0, size=(65, 3)), jnp.float32)
    s0, a0 = _features(params, dataclasses.replace(base, fused_line_gather=False), pts)
    s1, a1 = _features(params, dataclasses.replace(base, fused_line_gather=True), pts)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_fused_falls_back_on_mismatched_widths(rng):
    """Unequal per-orientation channel counts -> different row widths ->
    the fused path must silently fall back (still correct)."""
    base = TensorfConfig(
        grid_size=GRID,
        density_n_comp=(8, 4, 8),
        app_n_comp=(24, 12, 24),
    )
    params = init_tensorf(jax.random.PRNGKey(1), base)
    pts = jnp.asarray(rng.uniform(-1.0, 1.0, size=(65, 3)), jnp.float32)
    cfg_on = dataclasses.replace(base, fused_plane_gather=True)
    cfg_off = dataclasses.replace(base, fused_plane_gather=False)
    s1, a1 = _features(params, cfg_on, pts)
    s0, a0 = _features(params, cfg_off, pts)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
