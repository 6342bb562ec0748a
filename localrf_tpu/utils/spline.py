"""Smoothed-spline camera trajectories for path rendering
(ref: utils/utils.py:394-440): median prefilter + scipy UnivariateSpline per
translation/z/y component, re-orthogonalized rotation, spacing-normalized."""
from __future__ import annotations

import numpy as np
from scipy.interpolate import UnivariateSpline


def _strided_app(a: np.ndarray, window: int, stride: int) -> np.ndarray:
    nrows = ((a.size - window) // stride) + 1
    n = a.strides[0]
    return np.lib.stride_tricks.as_strided(
        a, shape=(nrows, window), strides=(stride * n, n)
    )


def _filter1d(vec: np.ndarray, time: np.ndarray, w: int) -> np.ndarray:
    stepsize = 2 * w + 1
    filtered = np.median(_strided_app(vec, stepsize, stepsize), axis=-1)
    return np.interp(time, time[w:-w:stepsize], filtered)


def _smooth_vec(vec, time, s, median_prefilter):
    if median_prefilter:
        vec = np.stack(
            [_filter1d(vec[..., i], time, 5) for i in range(3)], axis=-1
        )
    smoothed = np.zeros_like(vec)
    for i in range(vec.shape[1]):
        spl = UnivariateSpline(time, vec[..., i])
        spl.set_smoothing_factor(s)
        smoothed[..., i] = spl(time)
    return smoothed


def smooth_poses_spline(
    poses: np.ndarray, st: float = 0.5, sr: float = 4, median_prefilter: bool = True
) -> np.ndarray:
    """poses: [N, 3, 4] camera-to-world -> smoothed [N, 3, 4]."""
    poses = np.asarray(poses, np.float32).copy()
    if len(poses) < 30:
        median_prefilter = False
    poses[:, 0] = -poses[:, 0]
    scale = 2e-2 / np.median(
        np.linalg.norm(poses[1:, :3, 3] - poses[:-1, :3, 3], axis=-1)
    )
    poses[:, :3, 3] *= scale
    time = np.linspace(0, 1, len(poses))

    t = _smooth_vec(poses[..., 3], time, st, median_prefilter)
    z = _smooth_vec(poses[..., 2], time, sr, median_prefilter)
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    y_ = _smooth_vec(poses[..., 1], time, sr, median_prefilter)
    x = np.cross(z, y_)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    y = np.cross(x, z)

    smooth = np.stack([x, y, z, t], -1)
    smooth[:, 0] = -smooth[:, 0]
    smooth[:, :3, 3] /= scale
    return smooth.astype(np.float32)
