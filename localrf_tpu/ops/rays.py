"""Ray generation and contracted stratified sampling (pure jnp).

Differentiable w.r.t. focal/center/pose — pose and intrinsics gradients flow
through these functions (ref: utils/ray_utils.py, models/tensorBase.py:419-443,
local_tensorfs.py:23-29).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import contract


def ids2pixel_view(w: int, h: int, ids: jax.Array):
    """Ray index -> (col, row, view)."""
    col = ids % w
    row = (ids // w) % h
    view_ids = ids // (w * h)
    return col, row, view_ids


def ids2pixel(w: int, h: int, ids: jax.Array):
    """Ray index -> (col, row)."""
    col = ids % w
    row = (ids // w) % h
    return col, row


def get_ray_directions_lean(i, j, focal, center) -> jax.Array:
    """Pinhole camera-space directions for pixel centers (i+0.5, j+0.5).

    i, j: integer pixel coords [B]; focal: scalar; center: (cx, cy).
    Returns [B, 3] (not normalized; z = -1).
    """
    i = i.astype(jnp.float32) + 0.5
    j = j.astype(jnp.float32) + 0.5
    return jnp.stack(
        [(i - center[0]) / focal, -(j - center[1]) / focal, -jnp.ones_like(i)],
        axis=-1,
    )


def get_ray_directions_360(i, j, w: int, h: int) -> jax.Array:
    """Equirectangular (360) camera-space directions."""
    i = i.astype(jnp.float32) + 0.5
    j = j.astype(jnp.float32) + 0.5
    phi = j * jnp.pi / h - jnp.pi / 2.0
    theta = i * 2.0 * jnp.pi / w + jnp.pi
    x = jnp.cos(phi) * jnp.sin(theta)
    y = jnp.sin(phi)
    z = jnp.cos(phi) * jnp.cos(theta)
    return jnp.stack([x, y, z], axis=-1)


def get_rays_lean(directions: jax.Array, c2w: jax.Array):
    """Rotate camera-space dirs to world/field space.

    directions: [B, 3]; c2w: [B, 3, 4] -> (rays_o [B, 3], rays_d [B, 3]).
    """
    rays_o = c2w[:, :3, 3]
    rays_d = jnp.einsum("bij,bj->bi", c2w[:, :3, :3], directions)
    return rays_o, rays_d


def sample_ray_contracted(
    rays_o: jax.Array,
    rays_d: jax.Array,
    n_samples_total: int,
    is_train: bool,
    key: jax.Array | None,
):
    """Contracted stratified sampling along rays.

    N = n_samples_total // 6 linear samples in t in [0,1) plus N
    disparity-spaced samples in [near=1, far=1e3], all offset by +0.1, then
    contracted to [-2, 2]^3. Stratified jitter (shared across rays, per
    sample) when training. Returns (pts [R, 2N, 3], z_vals [2N] broadcast,
    dists [R or 1, 2N]).
    """
    n = n_samples_total // 6
    t_vals = jnp.arange(n, dtype=jnp.float32)[None, :] / n  # [1, N]
    interpx = t_vals
    if is_train:
        k1, k2 = jax.random.split(key)
        interpx = interpx + jax.random.uniform(k1, t_vals.shape) / n
        t_vals = t_vals + jax.random.uniform(k2, t_vals.shape) / n

    near, far = 1.0, 1e3
    disp = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    z_vals = jnp.concatenate([interpx, disp], axis=1) + 1e-1  # [1, 2N]

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    pts = contract(pts)

    dists = jnp.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros_like(z_vals[:, :1])], axis=-1
    )
    return pts, z_vals, dists
