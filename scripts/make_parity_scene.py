"""Generate a coherent synthetic scene (images/, depth/, flow_ds/) in the
reference's on-disk format, for the A/B parity run vs /root/reference.

Geometry: a smooth random TensoRF field rendered from a camera translating
along +x. Depth comes from the render; optical flow is the exact geometric
reprojection flow from depth + relative pose, so both implementations see
self-consistent supervision.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

W, H = 64, 48
N_FRAMES = 12
FOV = 60.0
STEP_X = 0.05


def build_scene(n_frames: int = N_FRAMES, fov: float = FOV, wh=None):
    import jax
    import jax.numpy as jnp

    from localrf_tpu.models.step import render_chunk
    from localrf_tpu.models.tensorf import TensorfConfig, init_tensorf
    from localrf_tpu.ops.math import get_cam2cams, get_pred_flow
    from localrf_tpu.ops.rays import get_ray_directions_lean, ids2pixel

    W, H = wh if wh is not None else (globals()["W"], globals()["H"])
    cfg = TensorfConfig(grid_size=(24, 24, 24), density_shift=-3.0)
    params = init_tensorf(jax.random.PRNGKey(7), cfg)
    for i in range(3):
        p = params[f"density_plane_{i}"]
        for ax in (1, 2):
            p = (jnp.roll(p, 1, ax) + p + jnp.roll(p, -1, ax)) / 3.0
        params[f"density_plane_{i}"] = p * 6.0
        a = params[f"app_plane_{i}"]
        for ax in (1, 2):
            a = (jnp.roll(a, 1, ax) + a + jnp.roll(a, -1, ax)) / 3.0
        params[f"app_plane_{i}"] = a * 3.0

    focal = W / (2 * np.tan(np.radians(fov) / 2))
    center = np.array([W / 2, H / 2], np.float32)
    ray_ids = jnp.arange(W * H, dtype=jnp.int32)

    c2ws = np.stack(
        [
            np.concatenate(
                [np.eye(3, dtype=np.float32), np.array([[STEP_X * i], [0], [0]], np.float32)],
                axis=1,
            )
            for i in range(n_frames)
        ]
    )

    imgs, depths = [], []
    chunk = 65536
    for i in range(n_frames):
        rgbs, deps = [], []
        for c0 in range(0, W * H, chunk):
            rgb, depth, _, _ = render_chunk(
                params, cfg, ray_ids[c0 : c0 + chunk], jnp.asarray(c2ws[i][None]),
                jnp.asarray(focal, jnp.float32), jnp.asarray(center), w=W, h=H,
            )
            rgbs.append(np.asarray(rgb))
            deps.append(np.asarray(depth))
        imgs.append(np.concatenate(rgbs).reshape(H, W, 3))
        depths.append(np.concatenate(deps).reshape(H, W))
    imgs = np.stack(imgs)
    depths = np.stack(depths)

    # exact reprojection flow from depth + relative poses
    i_px, j_px = ids2pixel(W, H, ray_ids)
    dirs = np.asarray(
        get_ray_directions_lean(i_px, j_px, jnp.asarray(focal, jnp.float32), jnp.asarray(center))
    )  # [P, 3] camera space
    ij = np.stack([np.asarray(i_px), np.asarray(j_px)], -1).astype(np.float32)

    c2w_j = jnp.asarray(c2ws)
    idx = jnp.arange(n_frames)
    fwd_c2c = get_cam2cams(c2w_j, idx, 1)
    bwd_c2c = get_cam2cams(c2w_j, idx, -1)
    pts = jnp.asarray(dirs)[None] * depths.reshape(n_frames, -1, 1)
    fwd_flow = np.asarray(
        get_pred_flow(pts, jnp.asarray(ij)[None], fwd_c2c, focal, jnp.asarray(center))
    ).reshape(n_frames, H, W, 2)
    bwd_flow = np.asarray(
        get_pred_flow(pts, jnp.asarray(ij)[None], bwd_c2c, focal, jnp.asarray(center))
    ).reshape(n_frames, H, W, 2)

    return imgs, depths, fwd_flow, bwd_flow


def write_scene(
    root: str,
    n_frames: int = N_FRAMES,
    fov: float = FOV,
    exposure_jitter: float = 0.0,
    wh=None,
):
    """exposure_jitter > 0 scales frame i's pixels by a deterministic gain
    in [1-j, 1+j] (exercises the exposure-compensation path); fov sets the
    TRUE rendering fov — pass the trainers a different --fov to make
    intrinsics optimization do real work (VERDICT r2 #4)."""
    import cv2

    from localrf_tpu.data.flow_io import encode_flow

    W, H = wh if wh is not None else (globals()["W"], globals()["H"])
    imgs, depths, fwd_flow, bwd_flow = build_scene(n_frames, fov, wh=(W, H))
    if exposure_jitter > 0:
        gains = 1.0 + exposure_jitter * np.sin(
            1.0 + 2.399963 * np.arange(n_frames)  # golden-angle walk, det.
        )
        imgs = np.clip(imgs * gains[:, None, None, None], 0, 1)
    os.makedirs(f"{root}/images", exist_ok=True)
    os.makedirs(f"{root}/depth", exist_ok=True)
    os.makedirs(f"{root}/flow_ds", exist_ok=True)

    inv = 1.0 / np.clip(depths, 0.2, None)
    inv_png = (inv / inv.max() * 60000).astype(np.uint16)
    mask = np.ones((H, W), bool)
    for i in range(n_frames):
        img8 = np.clip(imgs[i] * 255, 0, 255).astype(np.uint8)
        cv2.imwrite(f"{root}/images/{i:06d}.jpg", img8[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 98])
        cv2.imwrite(f"{root}/depth/{i:06d}.png", inv_png[i])
        # reference convention: fwd flow of frame i is stored under frame
        # i+1's basename; bwd under its own (ref: localrf_dataset.py:169-182)
        if i + 1 < n_frames:
            cv2.imwrite(f"{root}/flow_ds/fwd_{i + 1:06d}.png", encode_flow(fwd_flow[i], mask))
        cv2.imwrite(f"{root}/flow_ds/bwd_{i:06d}.png", encode_flow(bwd_flow[i], mask))
    # frame 0 fwd slot: the wrap-around read for the LAST frame (whose fwd
    # mask the training loop zeroes anyway)
    cv2.imwrite(f"{root}/flow_ds/fwd_{0:06d}.png", encode_flow(np.zeros((H, W, 2), np.float32), mask))
    np.save(f"{root}/gt_poses.npy", np.arange(n_frames)[:, None] * np.array([[STEP_X, 0, 0]]))
    print(f"wrote {n_frames} frames to {root} (fov={fov}, jitter={exposure_jitter})")


if __name__ == "__main__":
    write_scene(sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_scene")
