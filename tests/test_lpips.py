"""LPIPS graph parity: pure-JAX evaluator vs a torch replica of the official
architecture (AlexNet backbone, v0.1 semantics) with random weights routed
through the checkpoint converter — same validation pattern as test_dpt.py.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from localrf_tpu.utils import lpips as jlpips  # noqa: E402
from localrf_tpu.utils.metrics import rgb_lpips  # noqa: E402


def _random_state_dicts(seed=0):
    """Random-weight state dicts with the official checkpoints' key naming:
    torchvision AlexNet `features.{0,3,6,8,10}.{weight,bias}` and lpips
    `lin{0..4}.model.1.weight`."""
    g = torch.Generator().manual_seed(seed)
    convs = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3)]
    feat_ids = (0, 3, 6, 8, 10)
    alex = {}
    for fi, (co, ci, k) in zip(feat_ids, convs):
        alex[f"features.{fi}.weight"] = torch.randn((co, ci, k, k), generator=g) * 0.05
        alex[f"features.{fi}.bias"] = torch.randn((co,), generator=g) * 0.05
    lin = {}
    for li, (co, _, _) in enumerate(convs):
        # official shape: Conv2d(co, 1, kernel_size=1) -> [1, co, 1, 1]
        lin[f"lin{li}.model.1.weight"] = torch.rand((1, co, 1, 1), generator=g)
    return alex, lin


def _torch_lpips(alex, lin, x0, x1):
    """Reference forward built from the published architecture spec."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        taps = []
        params = [
            (alex["features.0.weight"], alex["features.0.bias"], 4, 2),
            (alex["features.3.weight"], alex["features.3.bias"], 1, 2),
            (alex["features.6.weight"], alex["features.6.bias"], 1, 1),
            (alex["features.8.weight"], alex["features.8.bias"], 1, 1),
            (alex["features.10.weight"], alex["features.10.bias"], 1, 1),
        ]
        for i, (w, b, stride, pad) in enumerate(params):
            x = F.relu(F.conv2d(x, w, b, stride=stride, padding=pad))
            taps.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, kernel_size=3, stride=2)
        return taps

    def unit(f):
        return f / (f.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)

    total = 0.0
    for li, (t0, t1) in enumerate(zip(feats(x0), feats(x1))):
        d = (unit(t0) - unit(t1)) ** 2
        w = lin[f"lin{li}.model.1.weight"].reshape(1, -1, 1, 1)
        total = total + (d * w).sum(dim=1).mean(dim=(1, 2))
    return total


def test_lpips_matches_torch_replica():
    alex, lin = _random_state_dicts()
    params = jlpips.load_torch_state(alex, lin)

    rng = np.random.default_rng(1)
    img0 = rng.uniform(0, 1, (64, 80, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape).astype(np.float32), 0, 1)

    ours = jlpips.lpips(params, img0, img1)

    x0 = torch.from_numpy(img0).permute(2, 0, 1)[None] * 2 - 1
    x1 = torch.from_numpy(img1).permute(2, 0, 1)[None] * 2 - 1
    ref = float(_torch_lpips(alex, lin, x0, x1)[0])

    assert np.isfinite(ours)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)


def test_lpips_properties():
    params = jlpips.get_params()  # fallback weights are fine for properties
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape).astype(np.float32), 0, 1)
    d_self = jlpips.lpips(params, a, a)
    d_ab = jlpips.lpips(params, a, b)
    assert np.isfinite(d_self) and np.isfinite(d_ab)
    assert d_self < 1e-6
    assert d_ab > d_self


def test_rgb_lpips_finite():
    """The renderer-facing metric must return finite values (VERDICT r1 #4)."""
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)
    v = rgb_lpips(a, b)
    assert np.isfinite(v) and v > 0


def test_lpips_npz_roundtrip(tmp_path):
    alex, lin = _random_state_dicts(seed=7)
    params = jlpips.load_torch_state(alex, lin)
    out = {}
    for li in range(5):
        out[f"conv{li}_w"] = np.asarray(params["convs"][li]["w"])
        out[f"conv{li}_b"] = np.asarray(params["convs"][li]["b"])
        out[f"lin{li}"] = np.asarray(params["lins"][li])
    p = tmp_path / "lpips_alex.npz"
    np.savez(p, **out)
    loaded = jlpips.load_weights_file(str(p))
    rng = np.random.default_rng(4)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert jlpips.lpips(loaded, a, b) == jlpips.lpips(params, a, b)
