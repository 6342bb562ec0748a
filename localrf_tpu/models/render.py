"""Volume rendering forward pass (dense, static-shape, TPU-friendly).

Functional equivalent of `TensorBase.forward` (ref: models/tensorBase.py:
567-636): contracted stratified sampling, occupancy culling, factored-grid
density, softplus, alpha-compositing transmittance scan, masked appearance +
shading MLP, background compositing.

TPU design note: the reference gathers only `ray_valid` / `weight > thres`
samples (ragged). Ragged gathers don't pay on TPU; we compute densely with
static shapes and zero out masked lanes, which is bit-equivalent for the
composited outputs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.math import alpha2weights, contract
from ..ops.occupancy import (
    coarsen_alpha,
    compact_valid_samples,
    occupancy_valid,
    pack_alpha_corners,
)
from ..ops.rays import sample_ray_contracted
from .tensorf import (
    TensorfConfig,
    apply_mlp,
    build_combined_quad_views,
    compute_app_feature,
    compute_density_app_features,
    compute_density_feature,
    feature2density,
    normalize_coord,
    sample_alpha,
)


def _gather_z_dists(z_vals, dists, sel):
    """Gather the shared per-sample z and dist scalars at the compacted
    sample indices in ONE 2-channel row gather instead of two 1-channel
    gathers: XLA's gather emitter is per-index bound independent of row
    width (PERF.md), so batching the channels halves the dispatch cost
    while producing bit-identical floats.

    z_vals/dists: [1, S]; sel: [R, M] int32  ->  ([R, M], [R, M])."""
    zd = jnp.stack([z_vals[0], dists[0]], axis=-1)  # [S, 2]
    rows = zd.at[sel].get(mode="promise_in_bounds")  # [R, M, 2]
    return rows[..., 0], rows[..., 1]


def render_rays(
    params,
    cfg: TensorfConfig,
    rays_o: jax.Array,
    rays_d: jax.Array,
    *,
    is_train: bool,
    white_bg: bool,
    refine=1.0,
    floater_thresh: float = 0.0,
    alpha_volume: jax.Array | None = None,
    key: jax.Array | None = None,
    n_samples: int = -1,
):
    """Render a chunk of rays against one field.

    rays_o/rays_d: [R, 3] field-space origins and (unnormalized) directions.
    Returns (rgb_map [R, 3], depth_map [R]).
    """
    n_total = n_samples if n_samples > 0 else cfg.n_samples

    if is_train:
        key_strat, key_bg = jax.random.split(key)
    else:
        key_strat = key_bg = None

    viewdirs_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    viewdirs = rays_d / viewdirs_norm

    pts, z_vals, dists = sample_ray_contracted(
        rays_o, viewdirs, n_total, is_train, key_strat
    )
    r, s = pts.shape[0], pts.shape[1]

    pts_norm = normalize_coord(pts, cfg)

    # fast path: density+appearance factors fused into one 128-lane quad
    # table per orientation — one gather (and one backward scatter) serves
    # both features (see tensorf.build_combined_quad_views)
    quad = build_combined_quad_views(params, cfg) if cfg.fast_gather else None

    compact = (
        alpha_volume is not None
        and 0 < cfg.occ_m < s
        and floater_thresh == 0.0
    )
    probe = cfg.occ_probe_ds if compact and 1 < cfg.occ_probe_ds < s else 0
    if probe:
        # coarse march probe: one trilinear lookup against the ds-pooled +
        # dilated alpha volume per group of `probe` consecutive samples
        # (conservative — see ops/occupancy.coarsen_alpha), compaction at
        # group granularity (probe^2-x smaller top_k than the exact path:
        # 1/ds the keys, 1/ds the k), then the exact fine cull only at the
        # occ_m *selected* samples instead of all S. Cuts the per-sample
        # occupancy gathers from R*S to R*S/ds + R*M.
        coarse = coarsen_alpha(alpha_volume, probe)
        packed_c = pack_alpha_corners(coarse)
        z_probe = z_vals[:, probe // 2 :: probe]  # [1, Sc] group midpoints
        sc = z_probe.shape[1]
        pts_probe = contract(
            rays_o[:, None, :] + viewdirs[:, None, :] * z_probe[..., None]
        )
        valid_c = occupancy_valid(
            packed_c,
            coarse.shape,
            jax.lax.stop_gradient(normalize_coord(pts_probe, cfg)).reshape(-1, 3),
        ).reshape(r, sc)
        # exclude the terminator group from natural selection so the forced
        # last slot (sel_c[:, -1] = Sc-1) can never duplicate a selected one
        valid_c = valid_c.at[:, -1].set(False)
        mc = max(1, cfg.occ_m // probe)
        sel_c, selv_c = compact_valid_samples(valid_c, mc)
        sel_valid = jnp.broadcast_to(
            selv_c[:, :, None], (r, mc, probe)
        ).reshape(r, mc * probe)
        # group-granularity z/dist gather: one [2*probe]-wide row per
        # selected GROUP instead of one 2-wide row per sample — probe-x
        # fewer gather indices on the per-index-bound emitter (PERF.md),
        # bit-identical values. Rows past S-1 replicate the terminator row,
        # exactly matching the old per-sample clamp min(sel, s-1).
        zd = jnp.stack([z_vals[0], dists[0]], axis=-1)  # [S, 2]
        target = sc * probe
        if target > s:
            # pad with the terminator row — matches the old per-sample
            # clamp min(sel, s-1)
            zd = jnp.concatenate(
                [zd, jnp.broadcast_to(zd[s - 1 : s], (target - s, 2))]
            )
        elif target < s:
            # probe-stride slicing can leave a sub-group tail (e.g. S=738,
            # probe=4 -> sc=184 covers samples 0..735): those tail samples
            # were unreachable in the old path too (max sel = sc*probe-1),
            # except the forced terminator slot handled below
            zd = zd[:target]
        zd_packed = zd.reshape(sc, probe * 2)
        rows = zd_packed.at[sel_c].get(mode="promise_in_bounds")  # [R, mc, 2p]
        rows = rows.reshape(r, mc * probe, 2)
        # forced dense terminator in the last slot (was sel[:, -1] = s-1)
        z_vals = rows[..., 0].at[:, -1].set(z_vals[0, s - 1])
        dists = rows[..., 1].at[:, -1].set(dists[0, s - 1])
        pts_sel = contract(
            rays_o[:, None, :] + viewdirs[:, None, :] * z_vals[..., None]
        )
        pts_norm = normalize_coord(pts_sel, cfg)
        if cfg.occ_refine:
            # exact fine cull at the selected samples only — same criterion
            # as the exact compact path, so the density-carrying sample set
            # is identical whenever no occupied group was truncated
            packed = pack_alpha_corners(alpha_volume)
            fine_v = occupancy_valid(
                packed,
                alpha_volume.shape,
                jax.lax.stop_gradient(pts_norm).reshape(-1, 3),
            ).reshape(r, mc * probe)
            sel_valid = sel_valid & fine_v
        sel_valid = sel_valid.at[:, -1].set(False)
        s = mc * probe
    elif compact:
        # occupancy compaction: one packed-byte gather per sample for the
        # occ>0 cull, then density only at the first occ_m occupied samples
        # per ray — static-shape analog of the reference's ragged cull
        # (ref: tensorBase.py:593-605)
        packed = pack_alpha_corners(alpha_volume)
        valid = occupancy_valid(
            packed,
            alpha_volume.shape,
            jax.lax.stop_gradient(pts_norm).reshape(-1, 3),
        ).reshape(r, s)
        valid = valid.at[:, -1].set(False)  # terminator handled separately
        sel, sel_valid = compact_valid_samples(valid, cfg.occ_m)
        # gather only the (non-differentiable) z/dist scalars by `sel`, then
        # RECOMPUTE the selected points from them: identical floats to
        # gathering pts_norm rows, but the elementwise recompute is VPU-free
        # while a [R,S,3]-row gather (and its backward scatter-add carrying
        # the pose/intrinsics gradient) hits XLA's slow sub-lane emitter
        z_vals, dists = _gather_z_dists(z_vals, dists, sel)
        pts_sel = contract(
            rays_o[:, None, :] + viewdirs[:, None, :] * z_vals[..., None]
        )
        pts_norm = normalize_coord(pts_sel, cfg)
        s = cfg.occ_m

    flat = pts_norm.reshape(-1, 3)
    app_feat_all = None
    rgb_all = None
    if quad is not None and cfg.fused_march:
        from ..ops.pallas.march import fused_march_features, fused_march_supported

        if fused_march_supported(cfg):
            vd_flat = jax.lax.stop_gradient(
                jnp.broadcast_to(viewdirs[:, None, :], (r, s, 3)).reshape(-1, 3)
            )
            sigma_feat, rgb_all = fused_march_features(
                params, quad, flat, vd_flat, cfg
            )
            sigma_feat = sigma_feat.reshape(r, s)
        else:
            sigma_feat, app_feat_all = compute_density_app_features(
                params, flat, cfg, quad
            )
            sigma_feat = sigma_feat.reshape(r, s)
    elif quad is not None:
        sigma_feat, app_feat_all = compute_density_app_features(params, flat, cfg, quad)
        sigma_feat = sigma_feat.reshape(r, s)
    else:
        sigma_feat = compute_density_feature(params, flat, cfg, None).reshape(r, s)
    sigma = feature2density(sigma_feat, cfg)

    if compact:
        sigma = jnp.where(sel_valid, sigma, 0.0)
    elif alpha_volume is not None:
        # dense cull via the packed-corner lookup: one uint8 gather per
        # point, exactly equivalent to trilinear occ > 0 (see ops/occupancy)
        packed = pack_alpha_corners(alpha_volume)
        occ = occupancy_valid(
            packed, alpha_volume.shape, pts_norm.reshape(-1, 3)
        ).reshape(r, s)
        sigma = jnp.where(occ, sigma, 0.0)

    # last sample excluded from density (ref: tensorBase.py:600)
    sigma = sigma.at[:, -1].set(0.0)

    if cfg.pallas_composite and floater_thresh == 0.0:
        from ..ops.pallas.composite import fused_weights

        weight = fused_weights(sigma, dists, cfg.distance_scale)
    else:
        alpha = 1.0 - jnp.exp(-sigma * dists * cfg.distance_scale)
        weight, _ = alpha2weights(alpha)

    acc_map = jnp.sum(weight, axis=-1)
    depth_map = jnp.sum(weight * z_vals, axis=-1) / viewdirs_norm[..., 0]

    if floater_thresh > 0:
        # suppress near-camera floaters in path renders (ref: tensorBase.py:617-620)
        sample_idx = jnp.arange(s, dtype=weight.dtype)[None]
        idx_map = jnp.sum(weight * sample_idx, axis=-1, keepdims=True)
        alpha = jnp.where(sample_idx < idx_map * floater_thresh, 0.0, alpha)
        weight, _ = alpha2weights(alpha)

    if rgb_all is not None:
        # fused-march path: rgb already computed in-kernel at every
        # (compacted) sample; apply the weight-threshold mask and composite —
        # identical semantics to the shared-gather branch below
        app_mask = weight > cfg.ray_march_weight_thres
        rgb = rgb_all.reshape(r, s, 3)
        rgb = jnp.where(app_mask[..., None], rgb, 0.0)
        rgb_map = jnp.sum(weight[..., None] * rgb, axis=-2)
    elif app_feat_all is not None:
        # shared-gather path: appearance features already computed at every
        # (compacted) sample; shade densely and zero samples below the weight
        # threshold — exactly the reference's masked ragged gather semantics
        # (ref: tensorBase.py:622-632) with static shapes
        app_mask = weight > cfg.ray_march_weight_thres
        vd = jnp.broadcast_to(viewdirs[:, None, :], (r, s, 3)).reshape(-1, 3)
        rgb = apply_mlp(
            params["mlp"], flat, jax.lax.stop_gradient(vd), app_feat_all, cfg, refine
        ).reshape(r, s, 3)
        rgb = jnp.where(app_mask[..., None], rgb, 0.0)
        rgb_map = jnp.sum(weight[..., None] * rgb, axis=-2)
    elif 0 < cfg.app_top_k < s:
        # oracle-path compaction: shade only the K highest-weight samples per
        # ray. Exactly reproduces the reference's `weight > thres` masked
        # gather whenever fewer than K samples pass the threshold — weights
        # sum to 1, so with thres=1e-3 at most 1000 samples can ever pass.
        k = cfg.app_top_k
        w_k, idx_k = jax.lax.top_k(weight, k)  # [R, K]
        ray_ix = jnp.arange(r)[:, None]
        pts_k = pts_norm[ray_ix, idx_k].reshape(-1, 3)
        app_feat = compute_app_feature(params, pts_k, cfg, None)  # [R*K, app_dim]
        vd = jnp.broadcast_to(viewdirs[:, None, :], (r, k, 3)).reshape(-1, 3)
        rgb_k = apply_mlp(
            params["mlp"], pts_k, jax.lax.stop_gradient(vd), app_feat, cfg, refine
        ).reshape(r, k, 3)
        app_mask = w_k > cfg.ray_march_weight_thres
        rgb_k = jnp.where(app_mask[..., None], rgb_k, 0.0)
        rgb_map = jnp.sum(w_k[..., None] * rgb_k, axis=-2)
    else:
        app_mask = weight > cfg.ray_march_weight_thres
        app_feat = compute_app_feature(params, flat, cfg, None)  # [R*S, app_dim]
        vd = jnp.broadcast_to(viewdirs[:, None, :], (r, s, 3)).reshape(-1, 3)
        rgb = apply_mlp(
            params["mlp"], flat, jax.lax.stop_gradient(vd), app_feat, cfg, refine
        ).reshape(r, s, 3)
        rgb = jnp.where(app_mask[..., None], rgb, 0.0)
        rgb_map = jnp.sum(weight[..., None] * rgb, axis=-2)

    # white background, or randomly flipped white background in training
    # (ref: tensorBase.py:633-634)
    if white_bg:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    elif is_train:
        flip = (jax.random.uniform(key_bg, ()) < 0.5).astype(rgb_map.dtype)
        rgb_map = rgb_map + flip * (1.0 - acc_map[..., None])

    return rgb_map, depth_map
