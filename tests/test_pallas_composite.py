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
