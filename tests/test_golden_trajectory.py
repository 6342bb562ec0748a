"""Golden-trajectory validation: render ground-truth images from a known
field and known camera motion, then jointly optimize poses + a fresh field
from scratch. PSNR must rise and the pose error (up to gauge scale) must
fall — the scientific check the reference performs implicitly via held-out
frames (SURVEY §4)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localrf_tpu.data.dataset import SyntheticDataset
from localrf_tpu.models.local import LocalConfig, LocalTensorfs
from localrf_tpu.models.step import render_chunk
from localrf_tpu.models.tensorf import TensorfConfig, init_tensorf

W, H = 32, 24
N_FRAMES = 6
FOV = 60.0


def _gt_scene():
    """A random-but-smooth field rendered from a translating camera."""
    cfg = TensorfConfig(grid_size=(20, 20, 20), density_shift=-3.0)
    key = jax.random.PRNGKey(42)
    params = init_tensorf(key, cfg)
    # smooth the density planes so the scene has large structures
    for i in range(3):
        p = params[f"density_plane_{i}"]
        for ax in (1, 2):
            p = (jnp.roll(p, 1, ax) + p + jnp.roll(p, -1, ax)) / 3.0
        params[f"density_plane_{i}"] = p * 8.0

    focal = W / (2 * np.tan(np.radians(FOV) / 2))
    center = np.array([W / 2, H / 2], np.float32)
    ray_ids = jnp.arange(W * H, dtype=jnp.int32)

    gt_t = np.stack(
        [np.array([0.06 * i, 0.0, 0.0], np.float32) for i in range(N_FRAMES)]
    )
    imgs = []
    for i in range(N_FRAMES):
        c2w = np.concatenate([np.eye(3, dtype=np.float32), gt_t[i][:, None]], -1)
        rgb, _, _, _ = render_chunk(
            params, cfg, ray_ids, jnp.asarray(c2w[None]),
            jnp.asarray(focal, jnp.float32), jnp.asarray(center), w=W, h=H,
        )
        imgs.append(np.asarray(rgb).reshape(H, W, 3))
    return np.stack(imgs), gt_t


def _pose_err(t_learned, t_gt):
    """Translation error after optimal gauge scaling."""
    num = float(np.sum(t_learned * t_gt))
    den = float(np.sum(t_learned * t_learned)) + 1e-12
    s = num / den
    return float(np.linalg.norm(s * t_learned - t_gt))


@pytest.mark.slow
@pytest.mark.parametrize(
    "gather_dtype,mlp_dtype,moment_dtype",
    [
        ("float32", "float32", "float32"),
        ("bfloat16", "float32", "float32"),
        # the CLI default pairing: bf16 gather tables AND bf16 MLP compute
        # must still converge jointly (ADVICE r2)
        ("bfloat16", "bfloat16", "float32"),
        # bf16 Adam moments under the production pairing (VERDICT r3 item
        # 10): measured a perf wash (PERF.md round 4), so f32 stays the
        # default — this gate covers users who flip it for HBM headroom
        ("bfloat16", "bfloat16", "bfloat16"),
    ],
)
def test_joint_pose_field_optimization_converges(gather_dtype, mlp_dtype, moment_dtype):
    imgs, gt_t = _gt_scene()
    ds = SyntheticDataset(imgs, "train", n_init_frames=N_FRAMES, test_frame_every=0)
    cfg = LocalConfig(
        fov=FOV,
        n_init_frames=N_FRAMES,
        WH=(W, H),
        n_views=4,
        batch_size=256,
        n_iters_per_frame=10**6,  # keep one field active for the whole test
        lr_exposure_init=0.0,  # exposure off: pure pose+field test
        loss_flow_weight=0.0,
        loss_depth_weight=0.0,
        l1_weight=0.0,
        moment_dtype=moment_dtype,
        tensorf=TensorfConfig(
            grid_size=(20, 20, 20),
            gather_dtype=gather_dtype,
            mlp_dtype=mlp_dtype,
        ),
    )
    model = LocalTensorfs(cfg)
    model.is_refining = True

    def render_view(i):
        rgb, _, _, _ = model.forward_eval(
            np.arange(W * H), np.array([i]), W, H, chunk=W * H
        )
        return rgb.reshape(H, W, 3)

    def psnr(a, b):
        return -10 * np.log10(np.mean((a - b) ** 2) + 1e-12)

    psnr_before = np.mean([psnr(render_view(i), imgs[i]) for i in (1, 4)])
    model.sync_window_to_host()
    err_before = _pose_err(model.t_all, gt_t)

    for _ in range(60):
        batches = [
            ds.sample(cfg.batch_size, True, True, n_views=cfg.n_views)
            for _ in range(5)
        ]
        model.run_chunk(batches, optimize_poses=True)

    psnr_after = np.mean([psnr(render_view(i), imgs[i]) for i in (1, 4)])
    model.sync_window_to_host()
    err_after = _pose_err(model.t_all, gt_t)

    assert np.isfinite(psnr_after)
    assert psnr_after > psnr_before + 3.0, (psnr_before, psnr_after)
    assert err_after < err_before, (err_before, err_after)
