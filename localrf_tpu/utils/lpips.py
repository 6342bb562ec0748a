"""Pure-JAX LPIPS perceptual distance (AlexNet backbone, v0.1 semantics).

TPU-native replacement for the reference's `lpips` package wrapper
(ref: localTensoRF/utils/utils.py:210-226), which the reference only ever
calls as `lpips.LPIPS(net='alex')(gt, im, normalize=True)`.

Architecture (Zhang et al. 2018, "The Unreasonable Effectiveness of Deep
Features as a Perceptual Metric"): inputs scaled to [-1, 1], per-channel
whitening by fixed shift/scale, five AlexNet conv feature taps (after each
ReLU), channel-unit-normalization, squared difference, per-layer learned 1x1
non-negative linear weighting, spatial mean, sum over layers.

Weights: `load_torch_state()` converts the official checkpoints (torchvision
AlexNet `features.*` + lpips `lin*.model.1.weight`) when the user provides
them (see scripts/download_weights.sh). Without weights, `init_params(key)`
gives a fixed-seed randomly-initialized backbone: finite and usable as a
relative perceptual distance (random convnets are a known-reasonable
perceptual basis), but NOT comparable to published LPIPS numbers — callers
are told which variant is active via `has_pretrained()`.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

# (out_ch, in_ch, kernel, stride, pad) of the 5 AlexNet conv layers
_ALEX_CONVS = (
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
)
# 3x3/stride-2 maxpool after relu1 and relu2
_POOL_AFTER = (0, 1)

# fixed input whitening of LPIPS's ScalingLayer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_params(key: jax.Array | int = 0) -> dict:
    """Fixed-seed He-initialized backbone + uniform lin weights (fallback)."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    keys = jax.random.split(key, len(_ALEX_CONVS))
    params: dict = {"convs": [], "lins": []}
    for k, (co, ci, ks, _, _) in zip(keys, _ALEX_CONVS):
        std = math.sqrt(2.0 / (ci * ks * ks))
        w = std * jax.random.normal(k, (co, ci, ks, ks), jnp.float32)
        params["convs"].append({"w": w, "b": jnp.zeros((co,), jnp.float32)})
        params["lins"].append(jnp.full((co,), 1.0 / co, jnp.float32))
    return params


def load_torch_state(alex_state: dict, lin_state: dict) -> dict:
    """Convert official torch checkpoints to the JAX pytree.

    alex_state: torchvision AlexNet state dict (keys `features.{0,3,6,8,10}.
    {weight,bias}`); lin_state: lpips state dict (keys `lin{0..4}.model.1.
    weight`, [Co,1,1] 1x1 convs). Accepts torch tensors or numpy arrays.
    """

    def arr(x):
        return jnp.asarray(np.asarray(getattr(x, "detach", lambda: x)().cpu())
                           if hasattr(x, "detach") else np.asarray(x))

    conv_ids = (0, 3, 6, 8, 10)
    params: dict = {"convs": [], "lins": []}
    for li, fi in enumerate(conv_ids):
        params["convs"].append(
            {
                "w": arr(alex_state[f"features.{fi}.weight"]),
                "b": arr(alex_state[f"features.{fi}.bias"]),
            }
        )
        lw = arr(lin_state[f"lin{li}.model.1.weight"])
        params["lins"].append(lw.reshape(-1))
    return params


def load_weights_file(path: str) -> dict:
    """Load a combined .npz produced by scripts/download_weights.sh."""
    data = np.load(path)
    params: dict = {"convs": [], "lins": []}
    for li in range(5):
        params["convs"].append(
            {"w": jnp.asarray(data[f"conv{li}_w"]), "b": jnp.asarray(data[f"conv{li}_b"])}
        )
        params["lins"].append(jnp.asarray(data[f"lin{li}"]))
    return params


def _features(params: dict, x: jax.Array) -> list[jax.Array]:
    """x: [N, 3, H, W] in [-1, 1] -> list of 5 post-ReLU feature maps."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(_SCALE)[
        None, :, None, None
    ]
    taps = []
    for li, ((_, _, _, stride, pad), conv) in enumerate(zip(_ALEX_CONVS, params["convs"])):
        x = jax.lax.conv_general_dilated(
            x,
            conv["w"],
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + conv["b"][None, :, None, None]
        x = jax.nn.relu(x)
        taps.append(x)
        if li in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x,
                -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, 1, 3, 3),
                window_strides=(1, 1, 2, 2),
                padding="VALID",
            )
    return taps


def _unit_normalize(f: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(f**2, axis=1, keepdims=True))
    return f / (norm + eps)


@functools.partial(jax.jit, static_argnames=())
def lpips_nchw(params: dict, x0: jax.Array, x1: jax.Array) -> jax.Array:
    """LPIPS distance for batches [N, 3, H, W] already scaled to [-1, 1]."""
    f0 = _features(params, x0)
    f1 = _features(params, x1)
    total = 0.0
    for t0, t1, lin in zip(f0, f1, params["lins"]):
        diff = (_unit_normalize(t0) - _unit_normalize(t1)) ** 2
        weighted = jnp.einsum("nchw,c->nhw", diff, lin)
        total = total + jnp.mean(weighted, axis=(1, 2))
    return total


def lpips(params: dict, img0: np.ndarray, img1: np.ndarray) -> float:
    """LPIPS between two [H, W, 3] images in [0, 1] (normalize=True mode).

    Inputs smaller than 32 px on a side are bilinearly upscaled first: the
    AlexNet stack downsamples ~32x, so tiny images would reach an empty
    feature map (mean over zero elements -> NaN)."""
    h, w = img0.shape[:2]
    if min(h, w) < 32:
        scale = 32.0 / min(h, w)
        new_hw = (int(round(h * scale)), int(round(w * scale)), 3)
        img0 = np.asarray(
            jax.image.resize(jnp.asarray(img0, jnp.float32), new_hw, "bilinear")
        )
        img1 = np.asarray(
            jax.image.resize(jnp.asarray(img1, jnp.float32), new_hw, "bilinear")
        )
    x0 = jnp.asarray(img0, jnp.float32).transpose(2, 0, 1)[None] * 2.0 - 1.0
    x1 = jnp.asarray(img1, jnp.float32).transpose(2, 0, 1)[None] * 2.0 - 1.0
    return float(lpips_nchw(params, x0, x1)[0])


_CACHED: dict = {}
WEIGHTS_ENV = "LOCALRF_TPU_LPIPS_WEIGHTS"
_DEFAULT_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "weights", "lpips_alex.npz"),
)


def get_params() -> dict:
    """Pretrained params if a weights file exists (env override via
    LOCALRF_TPU_LPIPS_WEIGHTS), else the fixed-seed fallback."""
    if "params" in _CACHED:
        return _CACHED["params"]
    path = os.environ.get(WEIGHTS_ENV)
    candidates = [path] if path else [os.path.abspath(p) for p in _DEFAULT_PATHS]
    for p in candidates:
        if p and os.path.exists(p):
            _CACHED["params"] = load_weights_file(p)
            _CACHED["pretrained"] = True
            return _CACHED["params"]
    _CACHED["params"] = init_params(0)
    _CACHED["pretrained"] = False
    return _CACHED["params"]


def has_pretrained() -> bool:
    get_params()
    return bool(_CACHED.get("pretrained", False))
