"""Host-side visualization: depth colormaps, camera-pose wireframes
(ref: utils/utils.py:73-129, 155-197). Offline only — never on the TPU path."""
from __future__ import annotations

import numpy as np


def to_uint8(x: np.ndarray) -> np.ndarray:
    """[0,1] float image -> uint8 by ROUNDING (nearest), not truncation.

    The reference truncates (`(x*255).byte()`, ref renderer.py:132), which
    biases every saved render half a quantum low: a model whose predictions
    are centered on the uint8-decoded training targets loses 1/255 on ~half
    its pixels at save time — measured as a systematic ~1.5-2 dB PSNR
    deficit at the ~50 dB parity-scene operating point that survived every
    dtype/precision ablation (PARITY_RUN.md "CPU control arms"). Rounding
    is the correct codec-side quantizer; it changes saved images only, not
    training."""
    return np.clip(np.rint(np.asarray(x) * 255), 0, 255).astype(np.uint8)


def visualize_depth(depth: np.ndarray, minmax=None):
    """Depth -> JET colormap uint8 [H, W, 3] plus the (mi, ma) used."""
    import cv2

    x = np.nan_to_num(np.asarray(depth))
    if minmax is None:
        positive = x[x > 0]
        mi = float(np.min(positive)) if positive.size else 0.0
        ma = float(np.max(x))
    else:
        mi, ma = minmax
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * np.clip(x, 0, 1)).astype(np.uint8)
    colored = cv2.applyColorMap(x, cv2.COLORMAP_JET)[..., ::-1]  # BGR -> RGB
    return colored, [mi, ma]


def get_camera_mesh(poses: np.ndarray, depth: float = 1.0):
    """Camera frustum wireframe vertices for [N, 3, 4] poses."""
    vertices = (
        np.array(
            [[-0.5, -0.5, -1], [0.5, -0.5, -1], [0.5, 0.5, -1], [-0.5, 0.5, -1], [0, 0, 0]],
            np.float32,
        )
        * depth
    )
    verts = vertices @ np.swapaxes(poses[:, :3, :3], -1, -2)
    verts = verts + poses[:, None, :3, 3]
    verts[..., 1:] *= -1  # axis flip for display
    wireframe = verts[:, [0, 1, 2, 3, 0, 4, 1, 2, 4, 3]]
    return verts, wireframe


def draw_poses(poses: np.ndarray, colours: list[str]) -> np.ndarray:
    """Matplotlib 3D wireframe plot of camera poses -> RGB uint8 image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    poses = np.asarray(poses, np.float32).copy()
    poses[:, :, 3] -= poses[:, :, 3].mean(axis=0, keepdims=True)

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    verts, wireframe = get_camera_mesh(poses, 0.05)
    center = verts[:, -1]
    ps = max(float(center.max()), 0.1)
    ms = min(float(center.min()), -0.1)
    ax.set_xlim3d(ms, ps)
    ax.set_ylim3d(ms, ps)
    ax.set_zlim3d(ms, ps)
    for c in range(wireframe.shape[0]):
        ax.plot(
            wireframe[c, :, 0], wireframe[c, :, 1], wireframe[c, :, 2],
            color=colours[c] if c < len(colours) else "C0",
        )
    plt.tight_layout()
    fig.canvas.draw()
    img = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    img = img.reshape(fig.canvas.get_width_height()[::-1] + (4,))[..., :3].copy()
    plt.close(fig)
    return img
