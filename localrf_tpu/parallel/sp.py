"""Sample-axis sequence parallelism for the volume-render march.

The reference has no attention/sequence axis; its long dimension is the
march itself (S samples per ray, ref: models/tensorBase.py:567-636 forward).
SURVEY §2's parallelism plan calls for optionally splitting the march over
devices and combining with an associative composition of transmittance
segments — this module implements that:

    per segment g:  T_g = prod(1 - alpha_i),  partials (rgb, acc, depth)
                    composited with the segment-local transmittance
    cross-segment:  prefix_g = prod_{h < g} T_h  (one tiny all_gather of
                    [R] scalars per device), global weight = prefix_g * w_local
    totals:         psum over the sample axis

This is exact compositing algebra (the transmittance product is
associative); only float re-association differs from the sequential scan.
Use cases: eval/path renders of very long marches, and small-batch phases
(test-pose refinement) where ray-batch DP alone under-utilizes the mesh.
Composes with ray-batch DP on a 2D mesh ("data", "sample").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
try:  # jax >= 0.7 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.tensorf import (
    TensorfConfig,
    apply_mlp,
    build_combined_quad_views,
    compute_density_app_features,
    compute_density_feature,
    compute_app_feature,
    feature2density,
    normalize_coord,
    sample_alpha,
)
from ..ops.math import contract

SAMPLE_AXIS = "sample"


def make_sp_mesh(n_devices: int | None = None) -> Mesh:
    import numpy as np

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (SAMPLE_AXIS,))


def make_dp_sp_mesh(n_data: int, n_sample: int) -> Mesh:
    """2D ("data", "sample") mesh: ray-batch DP x sample-axis march split.

    The data axis is outermost so ray shards ride the slower mesh dimension
    and the per-ray sample collectives (all_gather/psum in render_rays_sp)
    stay within an innermost — on real slices, ICI-contiguous — group."""
    import numpy as np

    from .sharding import DATA_AXIS

    devices = jax.devices()[: n_data * n_sample]
    assert len(devices) == n_data * n_sample, (
        f"need {n_data * n_sample} devices, have {len(jax.devices())}"
    )
    return Mesh(
        np.array(devices).reshape(n_data, n_sample), (DATA_AXIS, SAMPLE_AXIS)
    )


def _z_vals_dense(n_samples_total: int):
    """Deterministic (eval) contracted-sampling z/dists, [1, S] each —
    taken straight from ops/rays.sample_ray_contracted (dummy ray) so the
    schedule constants cannot drift from the sequential renderer's."""
    from ..ops.rays import sample_ray_contracted

    zero = jnp.zeros((1, 3))
    _, z_vals, dists = sample_ray_contracted(zero, zero, n_samples_total, False, None)
    return z_vals, dists


def render_rays_sp(
    params,
    cfg: TensorfConfig,
    rays_o: jax.Array,
    rays_d: jax.Array,
    mesh: Mesh,
    *,
    white_bg: bool = True,
    refine=1.0,
    alpha_volume: jax.Array | None = None,
):
    """Deterministic eval render with the march sharded over mesh axis
    "sample". Numerically equivalent to models.render.render_rays
    (is_train=False, no compaction) up to float re-association.

    rays_o/rays_d: [R, 3]. On a 1D ("sample",) mesh they are replicated; on
    a 2D ("data", "sample") mesh (make_dp_sp_mesh) they are sharded over the
    data axis (R must divide by mesh.shape["data"]) and the march is split
    over the sample axis within each ray shard — ray-batch DP composed with
    sample parallelism. Returns (rgb [R, 3], depth [R]).
    """
    from .sharding import DATA_AXIS

    dp = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    n_dev = mesh.shape[SAMPLE_AXIS]
    viewdirs_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    viewdirs = rays_d / viewdirs_norm

    z_vals, dists = _z_vals_dense(cfg.n_samples)
    s = z_vals.shape[1]
    pad = (-s) % n_dev
    if pad:
        # padded samples repeat the last z with dist 0 -> alpha 0 -> inert
        z_vals = jnp.concatenate(
            [z_vals, jnp.broadcast_to(z_vals[:, -1:], (1, pad))], axis=1
        )
        dists = jnp.pad(dists, ((0, 0), (0, pad)))

    quad = build_combined_quad_views(params, cfg) if cfg.fast_gather else None

    def segment(z_seg, d_seg, rays_o, viewdirs, params, quad, alpha_volume):
        # z_seg/d_seg [1, S/n] local slice; everything else replicated
        r = rays_o.shape[0]
        m = z_seg.shape[1]
        pts = contract(rays_o[:, None, :] + viewdirs[:, None, :] * z_seg[..., None])
        pts_norm = normalize_coord(pts, cfg)
        flat = pts_norm.reshape(-1, 3)
        if quad is not None:
            sigma_feat, app_feat = compute_density_app_features(params, flat, cfg, quad)
        else:
            sigma_feat = compute_density_feature(params, flat, cfg, None)
            app_feat = None
        sigma = feature2density(sigma_feat.reshape(r, m), cfg)
        if alpha_volume is not None:
            occ = sample_alpha(alpha_volume, pts.reshape(-1, 3), cfg) > 0
            sigma = jnp.where(occ.reshape(r, m), sigma, 0.0)

        alpha = 1.0 - jnp.exp(-sigma * d_seg * cfg.distance_scale)
        # opaque background terminator: the global last sample's alpha is
        # forced to 1, exactly as ops/math.alpha2weights does (with padding,
        # the padded tail repeats the last z, so the terminator lands on the
        # same point/rgb as the sequential path's sample S-1)
        idx = jax.lax.axis_index(SAMPLE_AXIS)
        is_last_dev = (idx == n_dev - 1).astype(alpha.dtype)
        alpha = alpha.at[:, -1].set(
            is_last_dev + (1.0 - is_last_dev) * alpha[:, -1]
        )
        one_m = 1.0 - alpha + 1e-10  # epsilon matches alpha2weights
        # segment-local exclusive transmittance and segment total
        t_local = jnp.cumprod(
            jnp.concatenate([jnp.ones((r, 1)), one_m[:, :-1]], axis=1), axis=1
        )
        w_local = alpha * t_local  # [R, m]
        t_seg = t_local[:, -1] * one_m[:, -1]  # prod over the segment, [R]

        # cross-segment prefix: gather every segment's T, multiply the ones
        # before this device's position along the sample axis
        t_all = jax.lax.all_gather(t_seg, SAMPLE_AXIS)  # [n_dev, R]
        before = jnp.arange(n_dev)[:, None] < idx
        prefix = jnp.prod(jnp.where(before, t_all, 1.0), axis=0)  # [R]
        weight = prefix[:, None] * w_local  # global compositing weights

        app_mask = weight > cfg.ray_march_weight_thres
        if app_feat is None:
            app_feat = compute_app_feature(params, flat, cfg, None)
        vd = jnp.broadcast_to(viewdirs[:, None, :], (r, m, 3)).reshape(-1, 3)
        rgb = apply_mlp(params["mlp"], flat, vd, app_feat, cfg, refine).reshape(r, m, 3)
        rgb = jnp.where(app_mask[..., None], rgb, 0.0)

        rgb_p = jnp.sum(weight[..., None] * rgb, axis=-2)  # [R, 3]
        acc_p = jnp.sum(weight, axis=-1)
        depth_p = jnp.sum(weight * z_seg, axis=-1)
        out = jnp.concatenate([rgb_p, acc_p[:, None], depth_p[:, None]], axis=-1)
        return jax.lax.psum(out, SAMPLE_AXIS)

    spec_rep = P()
    # jax >= 0.8 renamed check_rep -> check_vma; both disable the
    # replication/varying checker (the psum composition is replicated by
    # construction, and the checker rejects replicated params in older jax)
    import inspect

    check_kw = (
        "check_vma"
        if "check_vma" in inspect.signature(shard_map).parameters
        else "check_rep"
    )
    spec_rays = P(dp) if dp else spec_rep  # ray-major arrays: DP-sharded
    fn = shard_map(
        functools.partial(segment),
        mesh=mesh,
        in_specs=(
            P(None, SAMPLE_AXIS),  # z
            P(None, SAMPLE_AXIS),  # dists
            spec_rays, spec_rays, spec_rep, spec_rep, spec_rep,
        ),
        out_specs=spec_rays,
        **{check_kw: False},
    )
    out = fn(z_vals, dists, rays_o, viewdirs, params, quad, alpha_volume)
    rgb_map, acc_map, depth_map = out[:, :3], out[:, 3], out[:, 4]
    depth_map = depth_map / viewdirs_norm[..., 0]
    if white_bg:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, depth_map
