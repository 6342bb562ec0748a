"""Core differentiable math primitives (pure jnp).

Functional equivalents of the reference's tensor math:
  * scene contraction           (ref: utils/ray_utils.py:9-12)
  * 6D rotation parametrization (ref: utils/utils.py:381-392)
  * alpha compositing           (ref: models/tensorBase.py:23-32)
  * pose algebra + flow reprojection (ref: utils/utils.py:15-48)
  * scale/shift-invariant depth loss (ref: utils/utils.py:50-59)
  * TV regularizer              (ref: utils/utils.py:293-312)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def contract(x: jax.Array) -> jax.Array:
    """MERF-style L-inf scene contraction mapping R^3 -> [-2, 2]^3.

    x if ||x||_inf <= 1 else ((2*||x||_inf - 1) / ||x||_inf^2) * x
    """
    x_norm = jnp.clip(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-6, None)
    return jnp.where(x_norm <= 1.0, x, ((2.0 * x_norm - 1.0) / (x_norm**2)) * x)


def positional_encoding(positions: jax.Array, freqs: int) -> jax.Array:
    """sin/cos positional encoding with 2^k frequency bands."""
    freq_bands = 2.0 ** jnp.arange(freqs, dtype=positions.dtype)
    pts = (positions[..., None] * freq_bands).reshape(
        positions.shape[:-1] + (freqs * positions.shape[-1],)
    )
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)


def sixD_to_mtx(r: jax.Array) -> jax.Array:
    """Gram-Schmidt 6D rotation -> 3x3 matrix. r: [..., 3, 2] -> [..., 3, 3]."""
    b1 = r[..., 0]
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = r[..., 1] - jnp.sum(b1 * r[..., 1], axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def mtx_to_sixD(m: jax.Array) -> jax.Array:
    """3x3 rotation -> 6D (first two columns). [..., 3, 3] -> [..., 3, 2]."""
    return jnp.stack([m[..., 0], m[..., 1]], axis=-1)


def alpha2weights(alpha: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Alpha compositing weights via exclusive cumprod transmittance.

    The final sample's alpha is forced to 1 (opaque background terminator).
    alpha: [R, S] -> (weights [R, S], T [R, S+1]).
    """
    alpha = alpha.at[:, -1].set(1.0)
    t = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones((alpha.shape[0], 1), alpha.dtype), 1.0 - alpha + 1e-10], axis=-1
        ),
        axis=-1,
    )
    weights = alpha * t[:, :-1]
    return weights, t


def inverse_pose(pose: jax.Array) -> jax.Array:
    """Invert [N, 3, 4] (or [N, 4, 4]-like) rigid poses; returns [N, 3, 4] block."""
    r_inv = jnp.swapaxes(pose[:, :3, :3], 1, 2)
    t_inv = -jnp.matmul(r_inv, pose[:, :3, 3:])[..., 0]
    out = jnp.zeros_like(pose)
    out = out.at[:, :3, :3].set(r_inv)
    out = out.at[:, :3, 3].set(t_inv)
    return out


def get_cam2cams(cam2worlds: jax.Array, indices: jax.Array, offset: int) -> jax.Array:
    """Relative pose from camera `i` to camera `i+offset` (clamped at ends)."""
    idx = jnp.clip(indices + offset, 0, cam2worlds.shape[0] - 1)
    world2cam = inverse_pose(cam2worlds[idx])
    rot = jnp.matmul(world2cam[:, :3, :3], cam2worlds[indices, :3, :3])
    t = jnp.matmul(world2cam[:, :3, :3], cam2worlds[indices, :3, 3:])[..., 0]
    t = t + world2cam[:, :3, 3]
    out = jnp.zeros_like(world2cam)
    out = out.at[:, :3, :3].set(rot)
    out = out.at[:, :3, 3].set(t)
    return out


def get_fwd_bwd_cam2cams(cam2worlds: jax.Array, indices: jax.Array):
    return (
        get_cam2cams(cam2worlds, indices, 1),
        get_cam2cams(cam2worlds, indices, -1),
    )


def pts2px(pts: jax.Array, f: jax.Array, center: jax.Array) -> jax.Array:
    """Project camera-space points to pixels (y/z axis flip, z clamped)."""
    x = pts[..., 0]
    y = -pts[..., 1]
    z = jnp.clip(-pts[..., 2], 1e-6, None)
    return jnp.stack(
        [x / z * f + center[0] - 0.5, y / z * f + center[1] - 0.5], axis=-1
    )


def get_pred_flow(
    pts: jax.Array, ij: jax.Array, cam2cams: jax.Array, focal, center
) -> jax.Array:
    """Predicted optical flow from per-view camera-space points + relative pose.

    pts: [V, P, 3], ij: [V, P, 2], cam2cams: [V, 3, 4].
    """
    new_pts = jnp.einsum("vij,vpj->vpi", cam2cams[:, :3, :3], pts)
    new_pts = new_pts + cam2cams[:, None, :3, 3]
    new_ij = pts2px(new_pts, focal, center)
    return new_ij - ij.astype(new_ij.dtype)


def compute_depth_loss(dyn_depth: jax.Array, gt_depth: jax.Array):
    """Scale/shift-invariant depth loss (median/MAD normalization per view).

    Inputs are [V, P]; returns (dyn_norm, gt_norm, squared diff).
    """
    t_d = jnp.median(dyn_depth, axis=-1, keepdims=True)
    s_d = jnp.mean(jnp.abs(dyn_depth - t_d), axis=-1, keepdims=True)
    dyn_norm = (dyn_depth - t_d) / s_d

    t_gt = jnp.median(gt_depth, axis=-1, keepdims=True)
    s_gt = jnp.mean(jnp.abs(gt_depth - t_gt), axis=-1, keepdims=True)
    gt_norm = (gt_depth - t_gt) / s_gt
    return dyn_norm, gt_norm, (dyn_norm - gt_norm) ** 2


def tv_loss(x: jax.Array) -> jax.Array:
    """Total-variation loss over the trailing two axes of a [N, C, H, W] grid.

    Matches the reference semantics: 2 * (mean squared H-diff + mean squared
    W-diff), each term skipped when that axis has size 1.
    """
    h, w = x.shape[2], x.shape[3]
    tv = 0.0
    if h > 1:
        tv = tv + jnp.mean((x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2)
    if w > 1:
        tv = tv + jnp.mean((x[:, :, :, 1:] - x[:, :, :, :-1]) ** 2)
    return 2.0 * tv


def mse2psnr(mse) -> jax.Array:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def n_to_reso(n_voxels: int, aabb) -> list[int]:
    """Grid resolution with ~cubic voxels for a target total voxel count."""
    import numpy as np

    # float32 arithmetic to mirror the reference's torch tensor math exactly
    # (e.g. 64**3 voxels in a [-2,2]^3 box must give [64,64,64], not 63).
    aabb = np.asarray(aabb, dtype=np.float32)
    xyz_min, xyz_max = aabb[0], aabb[1]
    voxel_size = np.float32(
        ((xyz_max - xyz_min).prod() / np.float32(n_voxels)) ** np.float32(1.0 / 3.0)
    )
    return [int(v) for v in (xyz_max - xyz_min) / voxel_size]


def cal_n_samples(reso, step_ratio: float = 0.5) -> int:
    import numpy as np

    return int(np.linalg.norm(np.asarray(reso, dtype=np.float64)) / step_ratio)
