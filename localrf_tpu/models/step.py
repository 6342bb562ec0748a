"""Jitted training/eval steps for joint pose + field optimization.

One pure function per compile bucket; the host-side progressive state machine
(`localrf_tpu.models.local.LocalTensorfs`) supplies dynamic scalars so phase
flips (refining, regularizing, first-RF, window slides) never retrace.

Replaces the reference's mutable training path (ref: local_tensorfs.py:179-290,
train.py:349-437): loss construction, backward, per-frame-gated Adam steps,
lr decay bookkeeping — all fused into one XLA program per resolution stage.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.math import (
    compute_depth_loss,
    get_pred_flow,
    inverse_pose,
    sixD_to_mtx,
)
from ..ops.rays import (
    get_ray_directions_360,
    get_ray_directions_lean,
    get_rays_lean,
    ids2pixel,
)
from ..optim import (
    AdamState,
    PyTreeAdamState,
    adam_update,
    field_base_lrs,
    pytree_adam_update,
    scale_lr,
)
from .render import render_rays
from .tensorf import TensorfConfig, density_l1, tv_loss_app, tv_loss_density


class FieldState(NamedTuple):
    params: dict
    opt: PyTreeAdamState


class PoseState(NamedTuple):
    """Sliding-window pose/exposure parameters, stacked over frames [Wc]."""

    r: jax.Array  # [Wc, 3, 2]
    t: jax.Array  # [Wc, 3]
    exposure: jax.Array  # [Wc, 3, 3]
    r_opt: AdamState
    t_opt: AdamState
    e_opt: AdamState


class IntrState(NamedTuple):
    params: dict  # {"focal_offset": [], "center_rel": [2]}
    opt: PyTreeAdamState


@dataclasses.dataclass(frozen=True)
class StepStatics:
    """Hashable compile-bucket key."""

    cfg: TensorfConfig
    w: int
    h: int
    n_views: int
    px_per_view: int
    wc: int  # window capacity
    fov360: bool = False
    white_bg: bool = True
    optimize_poses: bool = True
    exposure_on: bool = True
    intrinsics_on: bool = False
    flow_on: bool = True
    depth_on: bool = True
    has_alpha: bool = False
    flow_weight: float = 1.0
    depth_weight: float = 0.1
    lr_spatial: float = 0.02
    lr_net: float = 1e-3


def cam2world_from_params(r: jax.Array, t: jax.Array) -> jax.Array:
    """[N,3,2]+[N,3] -> [N,3,4] (ref: local_tensorfs.py:292-299)."""
    return jnp.concatenate([sixD_to_mtx(r), t[..., None]], axis=-1)


def _cam2cams_clamped(c2w: jax.Array, indices: jax.Array, offset: int, n_valid):
    """get_cam2cams with the neighbor index clamped to the valid window
    prefix (ref: utils/utils.py:29-36 clamps to len(cam2worlds)-1)."""
    idx = jnp.clip(indices + offset, 0, n_valid - 1)
    world2cam = inverse_pose(c2w[idx])
    rot = jnp.matmul(world2cam[:, :3, :3], c2w[indices, :3, :3])
    t = jnp.matmul(world2cam[:, :3, :3], c2w[indices, :3, 3:])[..., 0]
    t = t + world2cam[:, :3, 3]
    out = jnp.zeros_like(world2cam)
    out = out.at[:, :3, :3].set(rot)
    out = out.at[:, :3, 3].set(t)
    return out


def _focal(intr_params, init_focal, w_scale):
    return init_focal * intr_params["focal_offset"] * w_scale


def _center(intr_params, w, h):
    return jnp.asarray([w, h], jnp.float32) * intr_params["center_rel"]


def _apply_exposure(rgb, exposure, view_ids, px_per_view, n_valid, test_id):
    """Per-frame 3x3 exposure (ref: local_tensorfs.py:481-497). In test-pose
    mode (`test_id` is a traced 0/1 scalar), use the detached average of the
    two neighbours' exposures."""
    v_m = jnp.maximum(view_ids - 1, 0)
    v_m = jnp.where(v_m == view_ids, 1, v_m)
    v_p = jnp.minimum(view_ids + 1, n_valid - 1)
    e_avg = jax.lax.stop_gradient((exposure[v_m] + exposure[v_p]) / 2.0)
    e_own = exposure[view_ids]
    t = jnp.asarray(test_id, e_own.dtype)
    e = e_avg * t + e_own * (1.0 - t)
    e = jnp.repeat(e, px_per_view, axis=0)
    return jnp.einsum("bij,bj->bi", e, rgb)


def forward_rays(
    field_params,
    pose: PoseState,
    intr_params,
    statics: StepStatics,
    ray_idx: jax.Array,
    view_ids: jax.Array,
    scalars: dict[str, Any],
    key: jax.Array,
    *,
    is_train: bool,
    test_id=0.0,
    alpha_volume=None,
):
    """Shared forward: rays from (pose, intrinsics), one-field render,
    exposure. Returns (rgb [B,3], depth [B], directions [B,3], ij [B,2])."""
    s = statics
    i, j = ids2pixel(s.w, s.h, ray_idx)
    if s.fov360:
        directions = get_ray_directions_360(i, j, s.w, s.h)
        focal = jnp.asarray(1.0)
        center = jnp.asarray([s.w / 2, s.h / 2], jnp.float32)
    else:
        focal = _focal(intr_params, scalars["init_focal"], scalars["w_scale"])
        center = _center(intr_params, s.w, s.h)
        directions = get_ray_directions_lean(i, j, focal, center)

    c2w = cam2world_from_params(pose.r[view_ids], pose.t[view_ids])  # [V,3,4]
    cam2rf = c2w.at[:, :3, 3].add(scalars["world2rf"])
    cam2rf = jnp.repeat(cam2rf, s.px_per_view, axis=0)  # [B,3,4]

    rays_o, rays_d = get_rays_lean(directions, cam2rf)
    rgb, depth = render_rays(
        field_params,
        s.cfg,
        rays_o,
        rays_d,
        is_train=is_train,
        white_bg=s.white_bg,
        refine=scalars["refine"],
        alpha_volume=alpha_volume,
        key=key,
    )
    if s.exposure_on:
        rgb = _apply_exposure(
            rgb, pose.exposure, view_ids, s.px_per_view, scalars["n_valid"], test_id
        )
    rgb = jnp.clip(rgb, 0.0, 1.0)
    ij = jnp.stack([i, j], axis=-1)
    return rgb, depth, directions, ij, focal, center


def _losses(
    field_params,
    pose: PoseState,
    intr_params,
    statics: StepStatics,
    batch,
    scalars,
    key,
    *,
    alpha_volume=None,
):
    s = statics
    rgb, depth, directions, ij, focal, center = forward_rays(
        field_params, pose, intr_params, s,
        batch["ray_idx"], batch["view_ids"], scalars, key,
        is_train=True,
        test_id=scalars.get("pose_only", 0.0),
        alpha_volume=alpha_volume,
    )

    lw = batch["loss_weights"]
    rgb_loss = 0.25 * jnp.mean(jnp.abs(rgb - batch["rgbs"]) * lw) / jnp.mean(lw)
    total = rgb_loss
    metrics = {"rgb_loss": rgb_loss}

    v, p = s.n_views, s.px_per_view
    reg_flag = scalars["reg_flag"]  # 0/1: rf_iter < n_iters_reg
    reg_w = scalars["reg_w"]  # lr_factor ** rf_iter

    if s.flow_on or s.depth_on:
        depth_v = depth.reshape(v, p)

    if s.flow_on:
        # optical-flow reprojection loss (ref: train.py:384-410)
        c2w_win = cam2world_from_params(pose.r, pose.t)  # [Wc,3,4] world space
        n_valid = scalars["n_valid"]
        fwd_c2c = _cam2cams_clamped(c2w_win, batch["view_ids"], 1, n_valid)
        bwd_c2c = _cam2cams_clamped(c2w_win, batch["view_ids"], -1, n_valid)
        dirs_v = directions.reshape(v, p, 3)
        ij_v = ij.reshape(v, p, 2)
        pts = dirs_v * depth_v[..., None]
        pred_fwd = get_pred_flow(pts, ij_v, fwd_c2c, focal, center)
        pred_bwd = get_pred_flow(pts, ij_v, bwd_c2c, focal, center)
        fwd_mask = batch["fwd_mask"].reshape(v, p)
        fwd_mask = jnp.where(
            (batch["view_ids"] == n_valid - 1)[:, None], 0.0, fwd_mask
        )
        bwd_mask = batch["bwd_mask"].reshape(v, p)
        arr = jnp.sum(jnp.abs(pred_bwd - batch["bwd_flow"].reshape(v, p, 2)), -1) * bwd_mask
        arr = arr + jnp.sum(jnp.abs(pred_fwd - batch["fwd_flow"].reshape(v, p, 2)), -1) * fwd_mask
        q = jnp.quantile(arr, 0.9, axis=1, keepdims=True)
        arr = jnp.where(arr > q, 0.0, arr)
        flow_loss = (
            jnp.mean(arr) * s.flow_weight * reg_w / ((s.w + s.h) / 2)
        ) * reg_flag
        total = total + flow_loss
        metrics["flow_loss"] = flow_loss

    if s.depth_on:
        # scale/shift-invariant monodepth loss (ref: train.py:412-423)
        inv_gt = batch["invdepths"].reshape(v, p)
        _, _, arr = compute_depth_loss(1.0 / jnp.clip(depth_v, 1e-6, None), inv_gt)
        q = jnp.quantile(arr, 0.8, axis=1, keepdims=True)
        arr = jnp.where(arr > q, 0.0, arr)
        depth_loss = (jnp.mean(arr) * s.depth_weight * reg_w) * reg_flag
        total = total + depth_loss
        metrics["depth_loss"] = depth_loss

    # TV / density-L1 regularizers with host-computed dynamic weights
    # (ref: local_tensorfs.py:361-375)
    tv_wd, tv_wa, l1_w = scalars["tv_wd"], scalars["tv_wa"], scalars["l1_w"]
    tv = jax.lax.cond(
        tv_wd > 0,
        lambda: tv_loss_density(field_params) * tv_wd,
        lambda: jnp.zeros((), jnp.float32),
    )
    tv = tv + jax.lax.cond(
        tv_wa > 0,
        lambda: tv_loss_app(field_params) * tv_wa,
        lambda: jnp.zeros((), jnp.float32),
    )
    l1 = jax.lax.cond(
        l1_w > 0,
        lambda: density_l1(field_params, s.cfg) * l1_w,
        lambda: jnp.zeros((), jnp.float32),
    )
    total = total + tv + l1
    metrics["tv_loss"] = tv
    metrics["l1_loss"] = l1
    metrics["total_loss"] = total
    return total, metrics


def train_core(
    field: FieldState,
    pose: PoseState,
    intr: IntrState,
    batch: dict,
    scalars: dict,
    statics: StepStatics,
    key: jax.Array,
    alpha_volume=None,
):
    """One optimization step (ref: local_tensorfs.py:179-290), fully traced.

    `scalars["pose_only"]` (0/1) switches between the full joint step and the
    reference's photometric test-pose refinement without retracing: on
    pose-only steps the field/exposure/intrinsics updates and all lr decays
    are gated off and the exposure is neighbour-averaged (test_id).
    """
    s = statics
    pose_only = scalars.get("pose_only", jnp.zeros(()))
    full = 1.0 - jnp.asarray(pose_only, jnp.float32)  # 1 on joint steps

    def loss_fn(field_params, pose_rte, intr_params):
        pose_full = pose._replace(
            r=pose_rte[0], t=pose_rte[1], exposure=pose_rte[2]
        )
        return _losses(
            field_params, pose_full, intr_params, s, batch, scalars, key,
            alpha_volume=alpha_volume,
        )

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
    (g_field, g_pose, g_intr), metrics = grad_fn(
        field.params, (pose.r, pose.t, pose.exposure), intr.params
    )

    lr_factor = scalars["lr_factor"]
    is_refining = scalars["is_refining"]
    gate = batch["gate"]  # [Wc] bool: linked to current RF & rf_iter < n_iters
    full_gate = full > 0

    # --- field (stepped on joint steps; lr decays after step while refining) ---
    base_lrs = field_base_lrs(field.params, s.lr_spatial, s.lr_net)
    new_params, f_opt = pytree_adam_update(
        field.params, g_field, field.opt, base_lrs, gate=full_gate
    )
    f_opt = f_opt._replace(
        lr_scale=f_opt.lr_scale
        * jnp.where((is_refining > 0) & full_gate, lr_factor, 1.0)
    )
    new_field = FieldState(new_params, f_opt)

    # --- poses (decay lr first on joint steps, then gated step) ---
    g_r, g_t, g_e = g_pose
    if s.optimize_poses:
        r_opt = scale_lr(pose.r_opt, lr_factor, gate & full_gate)
        t_opt = scale_lr(pose.t_opt, lr_factor, gate & full_gate)
        new_r, r_opt = adam_update(pose.r, g_r, r_opt, gate)
        new_t, t_opt = adam_update(pose.t, g_t, t_opt, gate)
    else:
        new_r, r_opt, new_t, t_opt = pose.r, pose.r_opt, pose.t, pose.t_opt

    if s.exposure_on:
        e_opt = scale_lr(pose.e_opt, lr_factor, gate & full_gate)
        new_e, e_opt = adam_update(pose.exposure, g_e, e_opt, gate & full_gate)
    else:
        new_e, e_opt = pose.exposure, pose.e_opt

    new_pose = PoseState(new_r, new_t, new_e, r_opt, t_opt, e_opt)

    # --- intrinsics: only while optimizing the first RF and refining ---
    if s.intrinsics_on:
        gate_i = (scalars["is_first_rf"] > 0) & (is_refining > 0) & full_gate
        i_opt = intr.opt._replace(
            lr_scale=intr.opt.lr_scale * jnp.where(gate_i, lr_factor, 1.0)
        )
        i_lrs = jax.tree.map(lambda _: scalars["lr_i_base"], intr.params)
        new_i_params, i_opt = pytree_adam_update(
            intr.params, g_intr, i_opt, i_lrs, gate=gate_i
        )
        new_intr = IntrState(new_i_params, i_opt)
    else:
        new_intr = intr

    return new_field, new_pose, new_intr, metrics


@functools.partial(jax.jit, static_argnames=("statics",))
def train_step(
    field, pose, intr, batch, scalars, statics: StepStatics, key, alpha_volume=None
):
    """Single full joint step (ref: local_tensorfs.py:193-290)."""
    scalars = dict(scalars, pose_only=jnp.zeros(()))
    return train_core(field, pose, intr, batch, scalars, statics, key, alpha_volume)


@functools.partial(jax.jit, static_argnames=("statics",))
def train_step_poses_only(
    field, pose, intr, batch, scalars, statics: StepStatics, key, alpha_volume=None
):
    """Photometric-only pose refinement for held-out test frames
    (ref: local_tensorfs.py:179-191, train.py:432-435). No lr decay."""
    scalars = dict(scalars, pose_only=jnp.ones(()))
    return train_core(field, pose, intr, batch, scalars, statics, key, alpha_volume)


@functools.partial(jax.jit, static_argnames=("statics", "n_steps"))
def train_chunk(
    field: FieldState,
    pose: PoseState,
    intr: IntrState,
    batches: dict,  # pytree of [K, ...] stacked batches
    scalars_seq: dict,  # pytree of [K]-leading per-step scalars
    statics: StepStatics,
    keys: jax.Array,  # [K, 2]
    n_steps: int,
    alpha_volume=None,
):
    """Fused schedule executor: K training steps in one on-device lax.scan.

    Removes per-iteration host dispatch entirely — the host only intervenes
    at schedule events (frame append, field spawn, upsample, occupancy
    refresh), which the driver aligns with chunk boundaries. Per-step
    dynamic scalars (lr factor, refine/regularize flags, pose-only switches,
    gates) are precomputed host-side into [K]-arrays.
    """

    def body(carry, xs):
        f, p, i = carry
        batch, scalars, key = xs
        f, p, i, metrics = train_core(
            f, p, i, batch, scalars, statics, key, alpha_volume
        )
        return (f, p, i), metrics

    (field, pose, intr), metrics = jax.lax.scan(
        body, (field, pose, intr), (batches, scalars_seq, keys), length=n_steps
    )
    return field, pose, intr, metrics


@functools.partial(jax.jit, static_argnames=("statics", "n_steps", "n_px"))
def train_chunk_pooled(
    field: FieldState,
    pose: PoseState,
    intr: IntrState,
    pool: dict,  # device pixel pool arrays, flat [capacity * n_px, C]
    index_seq: dict,  # {"px" [K,B], "slots" [K,V], "view_ids" [K,V], "gate" [K,Wc]}
    scalars_seq: dict,
    statics: StepStatics,
    keys: jax.Array,
    n_steps: int,
    n_px: int,
    alpha_volume=None,
):
    """Fused executor over the device-resident pixel pool: batches are
    gathered from HBM inside the scan body, so the host ships only int32
    sample indices per step (see data/pool.py)."""
    s = statics

    def body(carry, xs):
        f, p, i = carry
        idx, scalars, key = xs
        rows = (
            jnp.repeat(idx["slots"], s.px_per_view) * n_px + idx["px"]
        )  # [B] flat pool rows
        batch = {
            "ray_idx": idx["px"],
            "view_ids": idx["view_ids"],
            "gate": idx["gate"],
            "rgbs": pool["rgbs"][rows],
            "loss_weights": pool["loss_weights"][rows][:, None],
        }
        for k in ("invdepths", "fwd_flow", "bwd_flow", "fwd_mask", "bwd_mask"):
            if k in pool:
                batch[k] = pool[k][rows]
        f, p, i, metrics = train_core(
            f, p, i, batch, scalars, statics, key, alpha_volume
        )
        return (f, p, i), metrics

    (field, pose, intr), metrics = jax.lax.scan(
        body, (field, pose, intr), (index_seq, scalars_seq, keys), length=n_steps
    )
    return field, pose, intr, metrics


@functools.partial(
    jax.jit, static_argnames=("cfg", "w", "h", "floater_thresh", "white_bg", "fov360")
)
def render_chunk(
    field_params,
    cfg: TensorfConfig,
    ray_idx: jax.Array,
    cam2rf: jax.Array,  # [1, 3, 4] or [B, 3, 4]
    focal,
    center,
    *,
    w: int,
    h: int,
    floater_thresh: float = 0.0,
    white_bg: bool = True,
    fov360: bool = False,
    refine=1.0,
    alpha_volume=None,
):
    """Deterministic eval render of one chunk against one field."""
    i, j = ids2pixel(w, h, ray_idx)
    if fov360:
        directions = get_ray_directions_360(i, j, w, h)
    else:
        directions = get_ray_directions_lean(i, j, focal, center)
    if cam2rf.shape[0] == 1:
        cam2rf = jnp.broadcast_to(cam2rf, (ray_idx.shape[0], 3, 4))
    rays_o, rays_d = get_rays_lean(directions, cam2rf)
    rgb, depth = render_rays(
        field_params, cfg, rays_o, rays_d,
        is_train=False, white_bg=white_bg, refine=refine,
        floater_thresh=floater_thresh, alpha_volume=alpha_volume,
    )
    ij = jnp.stack([i, j], axis=-1)
    return rgb, depth, directions, ij


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "w", "h", "floater_thresh", "white_bg", "fov360"),
)
def render_frame(
    field_params,
    cfg: TensorfConfig,
    ray_idx: jax.Array,  # [n_chunks, chunk]
    cam2rf: jax.Array,  # [3, 4] single pose
    focal,
    center,
    *,
    w: int,
    h: int,
    floater_thresh: float = 0.0,
    white_bg: bool = True,
    fov360: bool = False,
    refine=1.0,
    alpha_volume=None,
):
    """Whole-frame eval render: all chunks in one on-device lax.scan (one
    dispatch per frame per field instead of one per 4096-ray chunk)."""

    def body(_, ids):
        i, j = ids2pixel(w, h, ids)
        if fov360:
            directions = get_ray_directions_360(i, j, w, h)
        else:
            directions = get_ray_directions_lean(i, j, focal, center)
        c2rf = jnp.broadcast_to(cam2rf[None], (ids.shape[0], 3, 4))
        rays_o, rays_d = get_rays_lean(directions, c2rf)
        rgb, depth = render_rays(
            field_params, cfg, rays_o, rays_d,
            is_train=False, white_bg=white_bg, refine=refine,
            floater_thresh=floater_thresh, alpha_volume=alpha_volume,
        )
        return None, (rgb, depth)

    _, (rgb, depth) = jax.lax.scan(body, None, ray_idx)
    return rgb.reshape(-1, 3), depth.reshape(-1)
