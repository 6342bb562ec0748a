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


@pytest.mark.slow
def test_large_batch_convergence_batch8192():
    """Multi-chip deployment arm (VERDICT r4 item 9): the DP scaling sweep
    says per-chip batch >=1024 rays holds 85% efficiency, so an 8-chip mesh
    wants global batch 8192 — 32x the toy arm's 256. Convergence at that
    batch must survive the lr adjustment large-batch Adam implies: sqrt
    scaling (x[sqrt(32)~5.7 -> use 4, conservative]) on the field lr and the
    pose lrs, with proportionally fewer steps. The scene is upscaled (64x48,
    8 frames = 24.6k pixels) so an 8192-ray batch is not a full-epoch draw.

    Gate mirrors the main golden test: PSNR +3 dB and gauge-aligned pose
    error strictly down. Ref schedule context: the reference trains at a
    fixed batch 4096 (opt.py batch_size) with per-iteration exponential lr
    decay; scaling batch by K with ~K fewer steps keeps the decay schedule
    aligned per-epoch.
    """
    global W, H, N_FRAMES
    W_, H_, NF_ = W, H, N_FRAMES
    try:
        W, H, N_FRAMES = 64, 48, 8
        imgs, gt_t = _gt_scene()
    finally:
        W, H, N_FRAMES = W_, H_, NF_
    w, h, nf = 64, 48, 8
    ds = SyntheticDataset(imgs, "train", n_init_frames=nf, test_frame_every=0)
    lr_scale = 4.0  # ~sqrt(32), conservative
    cfg = LocalConfig(
        fov=FOV,
        n_init_frames=nf,
        WH=(w, h),
        n_views=8,
        batch_size=8192,
        n_iters_per_frame=10**6,
        lr_R_init=5e-3 * lr_scale,
        lr_t_init=5e-4 * lr_scale,
        rf_lr_init=0.02 * lr_scale,
        lr_exposure_init=0.0,
        loss_flow_weight=0.0,
        loss_depth_weight=0.0,
        l1_weight=0.0,
        tensorf=TensorfConfig(grid_size=(20, 20, 20)),
    )
    model = LocalTensorfs(cfg)
    model.is_refining = True

    def render_view(i):
        rgb, _, _, _ = model.forward_eval(
            np.arange(w * h), np.array([i]), w, h, chunk=w * h
        )
        return rgb.reshape(h, w, 3)

    def psnr(a, b):
        return -10 * np.log10(np.mean((a - b) ** 2) + 1e-12)

    psnr_before = np.mean([psnr(render_view(i), imgs[i]) for i in (1, 5)])
    model.sync_window_to_host()
    err_before = _pose_err(model.t_all, gt_t)

    # 32x batch -> ~1/8 the steps of the 300-step toy arm (40), conservative
    for _ in range(8):
        batches = [
            ds.sample(cfg.batch_size, True, True, n_views=cfg.n_views)
            for _ in range(5)
        ]
        model.run_chunk(batches, optimize_poses=True)

    psnr_after = np.mean([psnr(render_view(i), imgs[i]) for i in (1, 5)])
    model.sync_window_to_host()
    err_after = _pose_err(model.t_all, gt_t)

    assert np.isfinite(psnr_after)
    assert psnr_after > psnr_before + 3.0, (psnr_before, psnr_after)
    assert err_after < err_before, (err_before, err_after)
