"""Pallas fused-compositing kernel vs the XLA alpha2weights path — values
and gradients (runs in interpret mode on CPU, compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localrf_tpu.ops.math import alpha2weights
from localrf_tpu.ops.pallas.composite import fused_weights

SCALE = 25.0


def _xla_weights(sigma, dists):
    sigma = sigma.at[:, -1].set(sigma[:, -1])  # no-op; parity on raw inputs
    alpha = 1.0 - jnp.exp(-sigma * dists * SCALE)
    w, _ = alpha2weights(alpha)
    return w


@pytest.mark.parametrize("r,s", [(32, 16), (513, 48)])
def test_fused_weights_matches_xla(rng, r, s):
    sigma = jnp.asarray(rng.uniform(0, 2, (r, s)).astype(np.float32))
    dists = jnp.asarray(rng.uniform(0.01, 0.5, (1, s)).astype(np.float32))
    w_ref = _xla_weights(sigma, dists)
    w_fused = fused_weights(sigma, dists, SCALE)
    np.testing.assert_allclose(np.asarray(w_fused), np.asarray(w_ref), rtol=1e-5, atol=1e-6)


def test_fused_weights_grad_matches_xla(rng):
    r, s = 64, 24
    sigma = jnp.asarray(rng.uniform(0, 2, (r, s)).astype(np.float32))
    dists = jnp.asarray(rng.uniform(0.01, 0.5, (1, s)).astype(np.float32))
    coef = jnp.asarray(rng.normal(size=(r, s)).astype(np.float32))

    g_ref = jax.grad(lambda x: jnp.sum(_xla_weights(x, dists) * coef))(sigma)
    g_fused = jax.grad(lambda x: jnp.sum(fused_weights(x, dists, SCALE) * coef))(sigma)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )


def test_fused_weights_terminator(rng):
    """Terminator semantics: weights sum to exactly 1 regardless of sigma."""
    sigma = jnp.asarray(rng.uniform(0, 3, (16, 12)).astype(np.float32))
    dists = jnp.asarray(rng.uniform(0.01, 0.5, (1, 12)).astype(np.float32))
    w = fused_weights(sigma, dists, SCALE)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-4)


def test_segsum_take_rows_grad_parity(rng):
    """Sort-free MXU segment-sum backward vs XLA scatter backward."""
    import jax.numpy as jnp

    from localrf_tpu.ops.pallas.segsum import take_rows

    t, c, p = 640, 48, 5000
    tab = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, t, p).astype(np.int32))
    co = jnp.asarray(rng.normal(size=(p, c)).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(take_rows(x, idx) * co))(tab)
    g0 = jax.grad(lambda x: jnp.sum(jnp.take(x, idx, axis=0) * co))(tab)
    scale = float(jnp.max(jnp.abs(g0))) + 1e-6
    assert float(jnp.max(jnp.abs(g1 - g0))) / scale < 5e-3


def test_onehot_take_rows_grad_parity(rng):
    """Pure-XLA one-hot matmul backward vs XLA scatter backward, incl. the
    bf16-table case (grad must come back in the table dtype)."""
    from localrf_tpu.ops.pallas.segsum import take_rows_onehot

    t, c, p = 640, 48, 5000
    tab = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, t, p).astype(np.int32))
    co = jnp.asarray(rng.normal(size=(p, c)).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(take_rows_onehot(x, idx) * co))(tab)
    g0 = jax.grad(lambda x: jnp.sum(jnp.take(x, idx, axis=0) * co))(tab)
    scale = float(jnp.max(jnp.abs(g0))) + 1e-6
    assert float(jnp.max(jnp.abs(g1 - g0))) / scale < 5e-3

    tab_bf = tab.astype(jnp.bfloat16)
    g_bf = jax.grad(
        lambda x: jnp.sum(take_rows_onehot(x, idx).astype(jnp.float32) * co)
    )(tab_bf)
    assert g_bf.dtype == jnp.bfloat16
    g_ref = jax.grad(
        lambda x: jnp.sum(jnp.take(x, idx, axis=0).astype(jnp.float32) * co)
    )(tab_bf)
    scale = float(jnp.max(jnp.abs(g_ref).astype(jnp.float32))) + 1e-6
    diff = float(jnp.max(jnp.abs((g_bf - g_ref).astype(jnp.float32))))
    assert diff / scale < 2e-2  # bf16 rounding of the f32 MXU accumulation


def test_onehot_multi_take_rows_grad_parity(rng):
    """Multi-segment one-hot gather (ONE dispatch over a stacked table,
    per-segment matmul backward) vs XLA scatter backward, with UNEQUAL
    per-segment row counts."""
    from localrf_tpu.ops.pallas.segsum import take_rows_onehot_multi

    sizes, c, p = (22, 14, 18), 48, 700
    splits = (0,)
    for s in sizes:
        splits = splits + (splits[-1] + s,)
    tab = jnp.asarray(rng.normal(size=(splits[-1], c)).astype(np.float32))
    idx = jnp.concatenate(
        [
            jnp.asarray(rng.integers(0, sizes[s], p).astype(np.int32))
            + splits[s]
            for s in range(3)
        ]
    )
    co = jnp.asarray(rng.normal(size=(3 * p, c)).astype(np.float32))
    out = take_rows_onehot_multi(tab, idx, splits)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.take(tab, idx, axis=0))
    )
    g1 = jax.grad(lambda x: jnp.sum(take_rows_onehot_multi(x, idx, splits) * co))(tab)
    g0 = jax.grad(lambda x: jnp.sum(jnp.take(x, idx, axis=0) * co))(tab)
    scale = float(jnp.max(jnp.abs(g0))) + 1e-6
    assert float(jnp.max(jnp.abs(g1 - g0))) / scale < 5e-3
    assert g1.dtype == tab.dtype


@pytest.mark.slow  # 29 s: full-render integration arm; the per-op onehot parity tests stay quick
def test_render_with_line_bwd_onehot_close_to_reference(rng):
    import dataclasses

    from localrf_tpu.models.render import render_rays
    from localrf_tpu.models.tensorf import TensorfConfig, init_tensorf

    cfg0 = TensorfConfig(grid_size=(16, 16, 16), line_bwd="gather")
    cfg1 = dataclasses.replace(cfg0, line_bwd="onehot")
    params = init_tensorf(jax.random.PRNGKey(0), cfg0)
    o = jnp.asarray(rng.uniform(-0.5, 0.5, (16, 3)).astype(np.float32))
    d = rng.normal(size=(16, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    def loss(p, cfg):
        rgb, _ = render_rays(p, cfg, o, d, is_train=False, white_bg=True, n_samples=48)
        return jnp.mean(rgb**2)

    g0 = jax.grad(lambda p: loss(p, cfg0))(params)
    g1 = jax.grad(lambda p: loss(p, cfg1))(params)
    for k in ("density_line_0", "app_line_2"):
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        assert np.max(np.abs(a - b)) / (np.abs(a).max() + 1e-8) < 5e-3


def test_render_with_segsum_close_to_reference(rng):
    import dataclasses

    from localrf_tpu.models.render import render_rays
    from localrf_tpu.models.tensorf import TensorfConfig, init_tensorf

    cfg0 = TensorfConfig(grid_size=(16, 16, 16), line_bwd="gather")
    cfg1 = dataclasses.replace(cfg0, matmul_segsum=True)
    params = init_tensorf(jax.random.PRNGKey(0), cfg0)
    o = jnp.asarray(rng.uniform(-0.5, 0.5, (16, 3)).astype(np.float32))
    d = rng.normal(size=(16, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    def loss(p, cfg):
        rgb, _ = render_rays(p, cfg, o, d, is_train=False, white_bg=True, n_samples=48)
        return jnp.mean(rgb**2)

    g0 = jax.grad(lambda p: loss(p, cfg0))(params)
    g1 = jax.grad(lambda p: loss(p, cfg1))(params)
    for k in ("density_line_0", "app_line_2"):
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        assert np.max(np.abs(a - b)) / (np.abs(a).max() + 1e-8) < 5e-3
