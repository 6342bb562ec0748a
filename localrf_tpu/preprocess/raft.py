"""RAFT optical flow in JAX/XLA (TPU-native preprocessing).

Functional re-implementation of the RAFT architecture (Teed & Deng, ECCV'20)
used by the reference's flow preprocessing (ref: scripts/run_flow.py:59-86):
feature/context encoders, all-pairs 4-level correlation pyramid, separable
ConvGRU update iterations, convex upsampling. Weights are converted from the
official `raft-things.pth` torch checkpoint with
`localrf_tpu.preprocess.convert.convert_raft_checkpoint`.

Layout: NHWC activations, HWIO kernels (TPU-native). Batch the two (fwd, bwd)
directions of a frame pair — or many pairs — along the batch axis.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

HDIM = 128  # GRU hidden
CDIM = 128  # context
CORR_LEVELS = 4
CORR_RADIUS = 4


# ----------------------------- layers -----------------------------


def conv2d(x, w, b=None, stride=1, padding=None):
    """Conv with torch-style SYMMETRIC padding.

    `padding`: int or (ph, pw); None = (kh//2, kw//2) ("same" for odd
    kernels). XLA's "SAME" string pads asymmetrically for strided convs
    (lo=(total//2)), while torch pads (p, p) on both sides — using the
    string would shift every strided conv's sampling grid by one pixel vs
    the official checkpoints."""
    if padding is None:
        padding = (w.shape[0] // 2, w.shape[1] // 2)
    elif isinstance(padding, int):
        padding = (padding, padding)
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride),
        ((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return out


def instance_norm(x, eps=1e-5):
    """InstanceNorm2d(affine=False): normalize over H, W per sample/channel."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


def batch_norm_infer(x, p, eps=1e-5):
    """BatchNorm2d inference with stored running statistics."""
    return (x - p["mean"]) / jnp.sqrt(p["var"] + eps) * p["scale"] + p["bias"]


def _norm(x, params, kind):
    if kind == "instance":
        return instance_norm(x)
    if kind == "batch":
        return batch_norm_infer(x, params)
    if kind == "none":
        return x
    raise ValueError(kind)


# ----------------------------- encoder -----------------------------


def _res_block(x, p, kind, stride):
    y = jax.nn.relu(_norm(conv2d(x, p["conv1_w"], p["conv1_b"], stride), p.get("norm1"), kind))
    y = jax.nn.relu(_norm(conv2d(y, p["conv2_w"], p["conv2_b"]), p.get("norm2"), kind))
    if stride != 1 or "down_w" in p:
        x = _norm(conv2d(x, p["down_w"], p["down_b"], stride), p.get("norm3"), kind)
    return jax.nn.relu(x + y)


def encoder_apply(params, x, kind: str):
    """BasicEncoder: 7x7/2 stem, 3 residual stages (64, 96/2, 128/2), 1x1 out.
    Input NHWC in [-1, 1]; output at 1/8 resolution."""
    x = jax.nn.relu(_norm(conv2d(x, params["conv1_w"], params["conv1_b"], 2), params.get("norm1"), kind))
    for stage, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
        x = _res_block(x, params[stage][0], kind, stride)
        x = _res_block(x, params[stage][1], kind, 1)
    return conv2d(x, params["conv2_w"], params["conv2_b"])


# ----------------------------- correlation -----------------------------


def build_corr_pyramid(fmap1, fmap2):
    """All-pairs correlation, then 4-level average pooling over target dims.

    fmap1/2: [B, H, W, D] -> list of [B*H*W, H/2^l, W/2^l] volumes."""
    b, h, w, d = fmap1.shape
    f1 = fmap1.reshape(b, h * w, d)
    f2 = fmap2.reshape(b, h * w, d)
    corr = jnp.einsum("bpd,bqd->bpq", f1, f2) / jnp.sqrt(jnp.float32(d))
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(CORR_LEVELS - 1):
        corr = jax.lax.reduce_window(
            corr, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
        pyramid.append(corr)
    return pyramid


def _bilinear_sample_nhwc(img, coords):
    """img [N, H, W, C]; coords [N, P, 2] as (x, y) pixel coords (zeros pad)."""
    n, h, w, c = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(n, h * w, c)
        v = jnp.take_along_axis(
            flat, (yi_c * w + xi_c)[..., None].astype(jnp.int32), axis=1
        )
        return jnp.where(inb[..., None], v, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def corr_lookup(pyramid, coords):
    """Sample (2r+1)^2 neighborhoods at each pyramid level.

    coords: [B, H, W, 2] target coords at level 0.
    Returns [B, H, W, CORR_LEVELS*(2r+1)^2]."""
    b, h, w, _ = coords.shape
    r = CORR_RADIUS
    # official channel ordering: the x offset varies SLOWEST over the
    # (2r+1)^2 taps (the torch code builds meshgrid(dy, dx) and feeds the
    # first component to the sampler's x axis) — converted convc1 weights
    # are per-tap, so the order must match exactly
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dd = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), axis=-1).reshape(-1, 2)

    out = []
    for lvl, corr in enumerate(pyramid):
        c = coords.reshape(b * h * w, 1, 2) / (2.0**lvl)
        pts = c + dd[None]  # [BHW, K, 2]
        smp = _bilinear_sample_nhwc(corr, pts)[..., 0]  # [BHW, K]
        out.append(smp)
    return jnp.concatenate(out, axis=-1).reshape(b, h, w, -1)


# ----------------------------- update block -----------------------------


def motion_encoder_apply(p, flow, corr):
    c = jax.nn.relu(conv2d(corr, p["convc1_w"], p["convc1_b"]))
    c = jax.nn.relu(conv2d(c, p["convc2_w"], p["convc2_b"]))
    f = jax.nn.relu(conv2d(flow, p["convf1_w"], p["convf1_b"]))
    f = jax.nn.relu(conv2d(f, p["convf2_w"], p["convf2_b"]))
    m = jax.nn.relu(conv2d(jnp.concatenate([c, f], -1), p["conv_w"], p["conv_b"]))
    return jnp.concatenate([m, flow], axis=-1)


def sep_conv_gru_apply(p, h, x):
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(conv2d(hx, p["convz1_w"], p["convz1_b"]))
    r = jax.nn.sigmoid(conv2d(hx, p["convr1_w"], p["convr1_b"]))
    q = jnp.tanh(conv2d(jnp.concatenate([r * h, x], -1), p["convq1_w"], p["convq1_b"]))
    h = (1 - z) * h + z * q
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(conv2d(hx, p["convz2_w"], p["convz2_b"]))
    r = jax.nn.sigmoid(conv2d(hx, p["convr2_w"], p["convr2_b"]))
    q = jnp.tanh(conv2d(jnp.concatenate([r * h, x], -1), p["convq2_w"], p["convq2_b"]))
    return (1 - z) * h + z * q


def flow_head_apply(p, h):
    return conv2d(jax.nn.relu(conv2d(h, p["conv1_w"], p["conv1_b"])), p["conv2_w"], p["conv2_b"])


def convex_upsample(flow, mask):
    """8x convex upsampling: per-pixel softmax over the 3x3 coarse
    neighborhood for each of the 8x8 fine positions."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    # 3x3 neighborhoods of (8 * flow): [B, H, W, 9, 2]
    f8 = 8.0 * flow
    pads = [(1, 1), (1, 1)]
    fp = jnp.pad(f8, ((0, 0), *pads, (0, 0)))
    neigh = jnp.stack(
        [
            fp[:, dy : dy + h, dx : dx + w, :]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=3,
    )  # [B, H, W, 9, 2]
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, neigh)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # b, h, u, w, v, c
    return up.reshape(b, h * 8, w * 8, 2)


# ----------------------------- full model -----------------------------


def raft_apply(params, image1, image2, iters: int = 30):
    """image1/2: [B, H, W, 3] in [0, 255]; H, W multiples of 8.

    Returns flow [B, H, W, 2] (pixels, level-0 resolution)."""
    img1 = image1 / 127.5 - 1.0
    img2 = image2 / 127.5 - 1.0

    fmap1 = encoder_apply(params["fnet"], img1, "instance")
    fmap2 = encoder_apply(params["fnet"], img2, "instance")
    pyramid = build_corr_pyramid(fmap1, fmap2)

    cmap = encoder_apply(params["cnet"], img1, "batch")
    net = jnp.tanh(cmap[..., :HDIM])
    inp = jax.nn.relu(cmap[..., HDIM:])

    b, h, w, _ = fmap1.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    coords0 = jnp.broadcast_to(jnp.stack([xs, ys], -1)[None], (b, h, w, 2))

    def body(carry, _):
        net, flow = carry
        corr = corr_lookup(pyramid, coords0 + flow)
        motion = motion_encoder_apply(params["update"]["encoder"], flow, corr)
        net2 = sep_conv_gru_apply(
            params["update"]["gru"], net, jnp.concatenate([inp, motion], -1)
        )
        dflow = flow_head_apply(params["update"]["flow_head"], net2)
        return (net2, flow + dflow), None

    (net, flow), _ = jax.lax.scan(
        body, (net, jnp.zeros((b, h, w, 2), jnp.float32)), None, length=iters
    )

    m = jax.nn.relu(conv2d(net, params["update"]["mask"]["conv1_w"], params["update"]["mask"]["conv1_b"]))
    mask = 0.25 * conv2d(m, params["update"]["mask"]["conv2_w"], params["update"]["mask"]["conv2_b"])
    return convex_upsample(flow, mask)


# ----------------------------- random init (tests) -----------------------------


def _rand_conv(key, kh, kw, cin, cout):
    k1, k2 = jax.random.split(key)
    scale = 1.0 / np.sqrt(kh * kw * cin)
    return (
        jax.random.normal(k1, (kh, kw, cin, cout)) * scale,
        jnp.zeros((cout,)),
    )


def init_raft(key) -> dict[str, Any]:
    """Random-weight RAFT (for tests / before loading converted weights)."""
    keys = iter(jax.random.split(key, 64))

    def conv(kh, kw, cin, cout):
        w, b = _rand_conv(next(keys), kh, kw, cin, cout)
        return w, b

    def bnp(c):
        return {
            "scale": jnp.ones((c,)),
            "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)),
            "var": jnp.ones((c,)),
        }

    def block(cin, cout, kind, stride):
        p = {}
        p["conv1_w"], p["conv1_b"] = conv(3, 3, cin, cout)
        p["conv2_w"], p["conv2_b"] = conv(3, 3, cout, cout)
        if kind == "batch":
            p["norm1"], p["norm2"] = bnp(cout), bnp(cout)
        if stride != 1 or cin != cout:
            p["down_w"], p["down_b"] = conv(1, 1, cin, cout)
            if kind == "batch":
                p["norm3"] = bnp(cout)
        return p

    def enc(kind):
        e = {}
        e["conv1_w"], e["conv1_b"] = conv(7, 7, 3, 64)
        if kind == "batch":
            e["norm1"] = bnp(64)
        e["layer1"] = [block(64, 64, kind, 1), block(64, 64, kind, 1)]
        e["layer2"] = [block(64, 96, kind, 2), block(96, 96, kind, 1)]
        e["layer3"] = [block(96, 128, kind, 2), block(128, 128, kind, 1)]
        e["conv2_w"], e["conv2_b"] = conv(1, 1, 128, 256)
        return e

    cor_planes = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2
    me = {}
    me["convc1_w"], me["convc1_b"] = conv(1, 1, cor_planes, 256)
    me["convc2_w"], me["convc2_b"] = conv(3, 3, 256, 192)
    me["convf1_w"], me["convf1_b"] = conv(7, 7, 2, 128)
    me["convf2_w"], me["convf2_b"] = conv(3, 3, 128, 64)
    me["conv_w"], me["conv_b"] = conv(3, 3, 192 + 64, 128 - 2)

    gru = {}
    gin = HDIM + CDIM + 128
    for i, (kh, kw) in (("1", (1, 5)), ("2", (5, 1))):
        for g in ("z", "r", "q"):
            gru[f"conv{g}{i}_w"], gru[f"conv{g}{i}_b"] = conv(kh, kw, gin, HDIM)

    fh = {}
    fh["conv1_w"], fh["conv1_b"] = conv(3, 3, HDIM, 256)
    fh["conv2_w"], fh["conv2_b"] = conv(3, 3, 256, 2)

    mk = {}
    mk["conv1_w"], mk["conv1_b"] = conv(3, 3, HDIM, 256)
    mk["conv2_w"], mk["conv2_b"] = conv(1, 1, 256, 64 * 9)

    return {
        "fnet": enc("instance"),
        "cnet": enc("batch"),
        "update": {"encoder": me, "gru": gru, "flow_head": fh, "mask": mk},
    }


# ----------------------------- padding helper -----------------------------


class InputPadder:
    """Pad images to multiples of 8 (replicate), unpad flows back."""

    def __init__(self, shape):
        h, w = shape[-3], shape[-2]
        self.pad_h = (8 - h % 8) % 8
        self.pad_w = (8 - w % 8) % 8

    def pad(self, x):
        return jnp.pad(
            x,
            ((0, 0), (self.pad_h // 2, self.pad_h - self.pad_h // 2),
             (self.pad_w // 2, self.pad_w - self.pad_w // 2), (0, 0)),
            mode="edge",
        )

    def unpad(self, x):
        h0 = self.pad_h // 2
        w0 = self.pad_w // 2
        h1 = x.shape[1] - (self.pad_h - h0)
        w1 = x.shape[2] - (self.pad_w - w0)
        return x[:, h0:h1, w0:w1]
