"""Evaluation metrics: PSNR, SSIM (mipnerf-style), optional LPIPS.

SSIM mirrors the reference's numpy implementation (ref: utils/utils.py:
232-287, itself derived from google/mipnerf). LPIPS always returns a finite
value: official converted weights when present, else a documented fixed-seed
random backbone — callers must report the latter under a distinct metric key
(see renderer.py) so it is never mistaken for a publishable LPIPS number.
"""
from __future__ import annotations

import numpy as np
import scipy.signal


def mse2psnr(mse: float) -> float:
    return float(-10.0 * np.log(mse) / np.log(10.0))


def rgb_psnr(img0: np.ndarray, img1: np.ndarray) -> float:
    return mse2psnr(float(np.mean((img0 - img1) ** 2)))


def rgb_ssim(
    img0: np.ndarray,
    img1: np.ndarray,
    max_val: float,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    return_map: bool = False,
):
    assert img0.ndim == 3 and img0.shape[-1] == 3 and img0.shape == img1.shape

    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((np.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = np.exp(-0.5 * f_i)
    filt /= np.sum(filt)

    def convolve2d(z, f):
        return scipy.signal.convolve2d(z, f, mode="valid")

    def filt_fn(z):
        return np.stack(
            [
                convolve2d(convolve2d(z[..., i], filt[:, None]), filt[None, :])
                for i in range(z.shape[-1])
            ],
            -1,
        )

    mu0 = filt_fn(img0)
    mu1 = filt_fn(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = np.maximum(0.0, filt_fn(img0**2) - mu00)
    sigma11 = np.maximum(0.0, filt_fn(img1**2) - mu11)
    sigma01 = filt_fn(img0 * img1) - mu01
    sigma01 = np.sign(sigma01) * np.minimum(
        np.sqrt(sigma00 * sigma11), np.abs(sigma01)
    )
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    return ssim_map if return_map else float(np.mean(ssim_map))


def rgb_lpips(np_gt: np.ndarray, np_im: np.ndarray, net_name: str = "alex") -> float:
    """LPIPS (AlexNet) via the pure-JAX evaluator in utils/lpips.py
    (ref wrapper: utils/utils.py:210-226). Uses official converted weights
    when present (scripts/download_weights.sh), else a documented fixed-seed
    backbone — always finite."""
    if net_name != "alex":
        raise ValueError(f"only the 'alex' LPIPS variant is supported, got {net_name}")
    from . import lpips as jlpips

    global _warned_random_lpips
    if not jlpips.has_pretrained() and not _warned_random_lpips:
        _warned_random_lpips = True
        print(
            "rgb_lpips: pretrained LPIPS weights not found (see"
            " scripts/download_weights.sh) — using the fixed-seed random"
            " backbone. Values are self-consistent but NOT comparable to"
            " published LPIPS numbers."
        )
    return jlpips.lpips(jlpips.get_params(), np_gt, np_im)


_warned_random_lpips = False


def lpips_backbone() -> str:
    """Which LPIPS variant rgb_lpips is using: log beside reported values."""
    from . import lpips as jlpips

    return "pretrained" if jlpips.has_pretrained() else "random-init"
