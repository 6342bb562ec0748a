"""Metrics, visualization and spline utilities."""
import numpy as np
import pytest

from localrf_tpu.utils.metrics import mse2psnr, rgb_psnr, rgb_ssim
from localrf_tpu.utils.spline import smooth_poses_spline
from localrf_tpu.utils.vis import draw_poses, visualize_depth


def test_ssim_identity(rng):
    img = rng.uniform(0, 1, (32, 40, 3)).astype(np.float64)
    assert rgb_ssim(img, img, 1.0) > 0.999


def test_ssim_decreases_with_noise(rng):
    img = rng.uniform(0, 1, (32, 40, 3))
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    assert rgb_ssim(img, noisy, 1.0) < rgb_ssim(img, img, 1.0) - 0.05


def test_psnr():
    a = np.zeros((4, 4, 3))
    b = np.full((4, 4, 3), 0.1)
    assert abs(rgb_psnr(a, b) - 20.0) < 1e-6
    assert mse2psnr(1e-4) == pytest.approx(40.0)


def test_visualize_depth(rng):
    depth = rng.uniform(0.5, 5, (16, 20)).astype(np.float32)
    img, (mi, ma) = visualize_depth(depth)
    assert img.shape == (16, 20, 3) and img.dtype == np.uint8


def test_draw_poses():
    poses = np.tile(
        np.concatenate([np.eye(3), np.zeros((3, 1))], -1)[None], (4, 1, 1)
    ).astype(np.float32)
    poses[:, 0, 3] = np.arange(4) * 0.1
    img = draw_poses(poses, ["C1"] * 4)
    assert img.ndim == 3 and img.shape[-1] == 3


def test_smooth_poses_spline_shape_and_orthonormality(rng):
    n = 40
    t = np.linspace(0, 1, n)
    poses = np.zeros((n, 3, 4), np.float32)
    for i in range(n):
        ang = 0.3 * t[i] + 0.01 * rng.normal()
        c, s = np.cos(ang), np.sin(ang)
        poses[i, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        poses[i, :3, 3] = [t[i] + 0.005 * rng.normal(), 0.02 * rng.normal(), 0]
    sm = smooth_poses_spline(poses)
    assert sm.shape == (n, 3, 4)
    rtr = np.einsum("bij,bik->bjk", sm[:, :3, :3], sm[:, :3, :3])
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (n, 1, 1)), atol=1e-3)
    # smoothing reduces jitter of translations
    def jerk(p):
        return np.abs(np.diff(p[:, 0, 3], 2)).mean()
    assert jerk(sm) <= jerk(poses) * 1.2


def test_throughput_counter():
    import time

    from localrf_tpu.utils.profiling import Throughput

    t = Throughput(batch_size=4096)
    t.add(10)
    time.sleep(0.05)
    assert t.it_per_sec > 0
    # ratio within tolerance (each property re-reads the clock)
    assert 0.9 * 4096 < t.rays_per_sec / t.it_per_sec < 1.1 * 4096


def test_vector_comp_diffs():
    import jax
    from localrf_tpu.models.tensorf import TensorfConfig, init_tensorf, vector_comp_diffs

    params = init_tensorf(jax.random.PRNGKey(0), TensorfConfig(grid_size=(10, 10, 10)))
    v = float(vector_comp_diffs(params))
    assert np.isfinite(v) and v > 0
    # orthogonal lines -> zero off-diagonal energy
    import jax.numpy as jnp
    for kind in ("density", "app"):
        for i in range(3):
            c, d = params[f"{kind}_line_{i}"].shape
            eye = jnp.eye(c, d)
            params[f"{kind}_line_{i}"] = eye
    assert float(vector_comp_diffs(params)) < 1e-6


def test_to_uint8_rounds_not_truncates():
    """Saving renders must quantize by NEAREST rounding: the truncating
    save biased every render half a quantum low, measured as a systematic
    ~1.5-2 dB PSNR deficit vs the reference at the ~50 dB parity-scene
    operating point (PARITY_RUN.md 'Root cause found')."""
    import numpy as np

    from localrf_tpu.utils.vis import to_uint8

    x = np.array([0.0, 0.4 / 255, 0.6 / 255, 127.49 / 255, 127.51 / 255, 1.0])
    np.testing.assert_array_equal(to_uint8(x), [0, 0, 1, 127, 128, 255])
    # out-of-range inputs clip instead of wrapping
    np.testing.assert_array_equal(to_uint8(np.array([-0.5, 1.5])), [0, 255])
    # a prediction centered on a uint8-decoded target must round-trip exactly
    targets = np.arange(256, dtype=np.float64) / 255
    noise = 0.4 / 255 * np.sign(np.sin(np.arange(256)))  # +-0.4 quanta
    assert (to_uint8(targets + noise) == np.arange(256)).all()
