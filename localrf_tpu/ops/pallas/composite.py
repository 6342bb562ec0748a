"""Pallas TPU kernel: fused volume-compositing weights (fwd + custom VJP).

Fuses the march core `alpha = 1 - exp(-sigma * dists * scale)`, the opaque
terminator (`alpha[:, -1] = 1`, ref: models/tensorBase.py:23-32) and the
exclusive-cumprod transmittance into one VMEM-resident scan, with an
analytic backward (suffix-sum reverse scan) instead of XLA's generic
cumprod autodiff chain:

  b_i = 1 - a_i + eps,  T_i = prod_{j<i} b_j,  w_i = a_i * T_i
  dL/da_i = g_i T_i - (sum_{k>i} g_k w_k) / b_i
  dL/dsigma_i = dL/da_i * (1 - a_i) * dists_i * scale   (0 at the terminator)

Layout: arrays are processed as [S, R] so the sequential sample scan walks
sublanes while rays ride the 128-lane axis. Falls back to interpret mode off
TPU so the same code path is unit-tested on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-10
TILE_R = 512


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(sigma_ref, dists_ref, w_ref, *, scale: float, s: int):
    def body(i, t):
        a = 1.0 - jnp.exp(-sigma_ref[i, :] * dists_ref[i, :] * scale)
        a = jnp.where(i == s - 1, 1.0, a)
        w_ref[i, :] = a * t
        return t * jnp.maximum(1.0 - a, EPS)

    jax.lax.fori_loop(0, s, body, jnp.ones_like(sigma_ref[0, :]))


def _bwd_kernel(
    sigma_ref, dists_ref, g_ref, dsigma_ref, a_scr, w_scr, t_scr,
    *, scale: float, s: int,
):
    def fwd_body(i, t):
        a = 1.0 - jnp.exp(-sigma_ref[i, :] * dists_ref[i, :] * scale)
        a = jnp.where(i == s - 1, 1.0, a)
        a_scr[i, :] = a
        w_scr[i, :] = a * t
        t_scr[i, :] = t
        return t * jnp.maximum(1.0 - a, EPS)

    jax.lax.fori_loop(0, s, fwd_body, jnp.ones_like(sigma_ref[0, :]))

    def bwd_body(k, suffix):
        i = s - 1 - k
        a = a_scr[i, :]
        # maximum() instead of (1-a+EPS): XLA may reassociate the latter
        # to (1+EPS)-a == 0 at the terminator, poisoning the division
        b = jnp.maximum(1.0 - a, EPS)
        g = g_ref[i, :]
        dl_da = g * t_scr[i, :] - suffix / b
        dsig = dl_da * (1.0 - a) * dists_ref[i, :] * scale
        dsigma_ref[i, :] = jnp.where(i == s - 1, 0.0, dsig)
        return suffix + g * w_scr[i, :]

    jax.lax.fori_loop(0, s, bwd_body, jnp.zeros_like(sigma_ref[0, :]))


def _pad_rows(x: jax.Array):
    """Pad the leading (ray) axis up to TILE_R granularity."""
    r = x.shape[0]
    pad = (-r) % TILE_R
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, r


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_weights(sigma: jax.Array, dists: jax.Array, scale: float) -> jax.Array:
    """Compositing weights for [R, S] densities and dists (broadcastable)."""
    return _fused_fwd_impl(sigma, dists, scale)


def _fused_fwd_impl(sigma, dists, scale):
    r, s = sigma.shape
    sig_p, r0 = _pad_rows(sigma)
    dst_p, _ = _pad_rows(jnp.broadcast_to(dists, sigma.shape))
    rp = sig_p.shape[0]

    w_t = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=float(scale), s=s),
        grid=(rp // TILE_R,),
        in_specs=[
            pl.BlockSpec((s, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, rp), jnp.float32),
        interpret=_interpret(),
    )(sig_p.T, dst_p.T)
    return w_t.T[:r0]


def _fused_fwd(sigma, dists, scale):
    return _fused_fwd_impl(sigma, dists, scale), (sigma, dists)


def _fused_bwd(scale, res, g):
    sigma, dists = res
    r, s = sigma.shape
    sig_p, r0 = _pad_rows(sigma)
    dst_p, _ = _pad_rows(jnp.broadcast_to(dists, sigma.shape))
    g_p, _ = _pad_rows(g)
    rp = sig_p.shape[0]

    dsig_t = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=float(scale), s=s),
        grid=(rp // TILE_R,),
        in_specs=[
            pl.BlockSpec((s, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, rp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((s, TILE_R), jnp.float32),
            pltpu.VMEM((s, TILE_R), jnp.float32),
            pltpu.VMEM((s, TILE_R), jnp.float32),
        ],
        interpret=_interpret(),
    )(sig_p.T, dst_p.T, g_p.T)
    return dsig_t.T[:r0], jnp.zeros_like(dists)


fused_weights.defvjp(_fused_fwd, _fused_bwd)
