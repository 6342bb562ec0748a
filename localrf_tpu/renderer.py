"""Offline full-frame renderer / evaluator (ref: renderer.py:16-190).

Host loop around the jitted per-chunk eval render: per-frame RGB + depth maps,
PSNR/SSIM metrics, flow/depth comparison panels, pose wireframes, PNG/JPG
dumps and mp4 export.
"""
from __future__ import annotations

import os

import numpy as np

from .ops.math import get_fwd_bwd_cam2cams, get_pred_flow, compute_depth_loss
from .utils.metrics import lpips_backbone, rgb_lpips, rgb_ssim
from .utils.vis import draw_poses, to_uint8, visualize_depth


def render(
    test_dataset,
    poses_mtx: np.ndarray,
    local_tensorfs,
    args,
    w: int,
    h: int,
    frame_indices=None,
    save_path: str | None = None,
    save_video: bool = False,
    save_frames: bool = False,
    test: bool = False,
    train_dataset=None,
    world2rf=None,
    img_format: str = "jpg",
    annotate: bool = False,
    save_raw_depth: bool = False,
    start: int = 0,
    floater_thresh: float = 0.0,
    add_frame_to_list: bool = True,
):
    import cv2
    import jax.numpy as jnp

    rgb_maps_tb, depth_maps_tb, gt_rgbs_tb, poses_vis = [], [], [], []
    fwd_flow_cmp_tb, bwd_flow_cmp_tb, depth_cmp_tb = [], [], []

    if test:
        idxs = [train_dataset.all_fbases[fb] for fb in test_dataset.all_fbases]
        idxs = [i for i in idxs if start <= i < poses_mtx.shape[0]]
    else:
        poses_mtx = poses_mtx[start:]
        idxs = list(range(poses_mtx.shape[0]))
        is_test_id = [
            fb in test_dataset.all_fbases for fb in train_dataset.all_fbases
        ]
        if frame_indices is None:
            # nearest train pose per rendered pose for blending weights
            # (ref: renderer.py:45-52)
            t_c2w = local_tensorfs.get_cam2world()[:, :, 3]
            frame_indices = np.array(
                [
                    int(np.argmin(np.linalg.norm(t_c2w - pose[None, :, 3], axis=-1)))
                    for pose in poses_mtx
                ]
            )

    n_rays = w * h
    rays_ids = np.arange(n_rays, dtype=np.int64)
    metrics = {}
    for i, idx in enumerate(idxs):
        if test:
            view_ids = np.array([idx])
            cam2world = None
        else:
            view_ids = np.array([int(frame_indices[idx])])
            cam2world = poses_mtx[i][None]

        rgb_map, depth_map, directions, ij = local_tensorfs.forward_eval(
            rays_ids,
            view_ids,
            w,
            h,
            cam2world=cam2world,
            world2rf=world2rf,
            test_id=test or (not test and is_test_id[int(view_ids[0])]),
            chunk=args.batch_size,
            floater_thresh=floater_thresh,
        )

        if test and add_frame_to_list:
            fbase = train_dataset.get_frame_fbase(idx)
            # flow comparison panels (ref: renderer.py:79-116)
            if test_dataset.all_fwd_flow is not None:
                cam2world_all = local_tensorfs.get_cam2world()
                import jax.numpy as jnp

                fwd_c2c, bwd_c2c = get_fwd_bwd_cam2cams(
                    jnp.asarray(cam2world_all), jnp.asarray(view_ids)
                )
                pts = directions[None] * depth_map[None, ..., None]
                focal = local_tensorfs.focal(w)
                center = local_tensorfs.center(w, h)
                pred_fwd = np.asarray(
                    get_pred_flow(jnp.asarray(pts), jnp.asarray(ij[None]), fwd_c2c, focal, jnp.asarray(center))
                ).reshape(h, w, 2)
                pred_bwd = np.asarray(
                    get_pred_flow(jnp.asarray(pts), jnp.asarray(ij[None]), bwd_c2c, focal, jnp.asarray(center))
                ).reshape(h, w, 2)
                ti = test_dataset.all_fbases[fbase]

                def _panel(pred, gt_flow, gt_mask):
                    gt_flow = cv2.resize(gt_flow, (w, h), interpolation=cv2.INTER_NEAREST)
                    gt_mask = cv2.resize(
                        gt_mask.astype(np.float32), (w, h), interpolation=cv2.INTER_NEAREST
                    )
                    cols = []
                    for c in range(2):
                        cmp_c = np.vstack([pred[..., c], gt_flow[..., c]])
                        q = np.quantile(cmp_c, 0.9)
                        cmp_c = cmp_c / (q if q != 0 else 1.0)
                        err = np.abs(pred[..., c] - gt_flow[..., c]) * gt_mask / w
                        cols.append(np.vstack([cmp_c, err]))
                    return np.clip(np.hstack(cols), 0, 1)

                fwd_flow_cmp_tb.append(
                    _panel(pred_fwd, test_dataset.all_fwd_flow[ti], test_dataset.all_fwd_mask[ti])
                )
                bwd_flow_cmp_tb.append(
                    _panel(pred_bwd, test_dataset.all_bwd_flow[ti], test_dataset.all_bwd_mask[ti])
                )

            # depth normalization error panel (ref: renderer.py:118-124)
            if test_dataset.all_invdepths is not None:
                import jax.numpy as jnp

                inv = cv2.resize(
                    test_dataset.all_invdepths[test_dataset.all_fbases[fbase]],
                    (w, h),
                    interpolation=cv2.INTER_NEAREST,
                ).reshape(1, -1)
                dyn_n, gt_n, err = compute_depth_loss(
                    jnp.asarray(1.0 / np.clip(depth_map[None], 1e-6, None)),
                    jnp.asarray(inv),
                )
                panel = np.vstack(
                    [
                        0.5 * np.asarray(dyn_n[0]).reshape(h, w),
                        0.5 * np.asarray(gt_n[0]).reshape(h, w),
                        np.asarray(err[0]).reshape(h, w),
                    ]
                )
                depth_cmp_tb.append(np.clip(panel, 0, 1))

        rgb_map = rgb_map.reshape(h, w, 3)
        depth_map = depth_map.reshape(h, w)
        depth_map_vis, _ = visualize_depth(depth_map, [0, 5])

        if annotate:
            # frame id + contributing fields overlay (ref: renderer.py:131-142)
            img8 = to_uint8(rgb_map).copy()
            weights = local_tensorfs.blending_weights[int(view_ids[0])]
            rf_ids = np.nonzero(weights)[0].tolist()
            wvals = [round(float(weights[r]), 1) for r in rf_ids]
            for text, ypos in (
                (f"id: {idx}", h - 70),
                (f"RFs: {rf_ids}", h - 40),
                (f"W: {wvals}", h - 10),
            ):
                cv2.putText(img8, text, (1, ypos), cv2.FONT_HERSHEY_SIMPLEX,
                            0.8, (255, 255, 255), 2, cv2.LINE_AA)
            rgb_map = img8.astype(np.float32) / 255

        all_poses = np.concatenate([poses_mtx, poses_mtx[min(idx, len(poses_mtx) - 1)][None]], 0)
        colours = ["C1"] * poses_mtx.shape[0] + ["C2"]
        pose_vis = draw_poses(all_poses, colours)
        pose_vis = cv2.resize(
            pose_vis,
            (int(pose_vis.shape[1] * h / pose_vis.shape[0]), h),
        )

        if add_frame_to_list or (save_video and save_path is not None):
            rgb_maps_tb.append(rgb_map)
            depth_maps_tb.append(depth_map_vis)
            poses_vis.append(pose_vis)

        fbase = f"{i:06d}"
        if test:
            fbase = train_dataset.get_frame_fbase(idx)
            gt = test_dataset.all_rgbs[test_dataset.all_fbases[fbase]]
            if gt.ndim == 1 or gt.shape[:2] != (h, w):
                gt = gt.reshape(test_dataset.img_wh[1], test_dataset.img_wh[0], 3)
                gt = cv2.resize(gt, (w, h))
            if add_frame_to_list:
                gt_rgbs_tb.append(gt)
            mse = float(np.mean((gt - rgb_map) ** 2))
            # ref logs LPIPS at eval too (utils/utils.py:210-226). Without
            # official weights the fixed-seed-backbone distance is reported
            # under a DISTINCT key so it can never be mistaken for a
            # publishable LPIPS number; "lpips_backbone" records which.
            lpips_key = (
                "lpips" if lpips_backbone() == "pretrained" else "lpips_randinit"
            )
            metrics[fbase] = {
                "mse": mse,
                "ssim": rgb_ssim(gt, rgb_map, 1),
                lpips_key: rgb_lpips(
                    gt.astype(np.float32), rgb_map.astype(np.float32)
                ),
                "lpips_backbone": lpips_backbone(),
            }

        if save_frames and save_path is not None:
            os.makedirs(f"{save_path}/rgb_maps", exist_ok=True)
            os.makedirs(f"{save_path}/depth_maps", exist_ok=True)
            cv2.imwrite(
                f"{save_path}/rgb_maps/{fbase}.{img_format}",
                to_uint8(rgb_map[..., ::-1]),
            )
            cv2.imwrite(
                f"{save_path}/rgb_maps/{fbase}_pose.{img_format}", pose_vis[..., ::-1]
            )
            cv2.imwrite(
                f"{save_path}/depth_maps/{fbase}.{img_format}",
                depth_map_vis[..., ::-1],
            )
            if save_raw_depth:
                cv2.imwrite(f"{save_path}/depth_maps/{fbase}.tiff", depth_map)

    if save_video and save_path is not None:
        import imageio

        os.makedirs(save_path, exist_ok=True)
        for name, frames in (
            ("video", [to_uint8(f) for f in rgb_maps_tb]),
            ("posevideo", poses_vis),
            ("depthvideo", depth_maps_tb),
        ):
            if frames:
                try:
                    with open(f"{save_path}/{name}.mp4", "wb") as f:
                        imageio.mimwrite(
                            f, np.stack(frames), fps=30, quality=6, format="mp4",
                            output_params=["-f", "mp4"],
                        )
                except Exception as e:  # no ffmpeg backend: frames are still
                    # saved as images under rgb_maps//depth_maps/
                    print(f"mp4 export skipped ({name}): {e}")

    # release the per-field HBM copies cached during this render session
    local_tensorfs.clear_eval_cache()

    return (
        rgb_maps_tb,
        depth_maps_tb,
        gt_rgbs_tb,
        fwd_flow_cmp_tb,
        bwd_flow_cmp_tb,
        depth_cmp_tb,
        metrics,
    )
