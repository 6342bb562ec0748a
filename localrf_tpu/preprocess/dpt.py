"""DPT monocular depth in JAX/XLA (TPU-native preprocessing).

Functional re-implementation of DPT (Ranftl et al., ICCV'21) exactly
matching the Hugging Face `DPTForDepthEstimation` graph, so the official
Intel/dpt-large (or -hybrid's plain-ViT variants) weights convert directly:
ViT backbone with hooks, readout-projected reassemble stage, RefineNet-style
feature fusion, 3-conv depth head. Used by the reference's depth
preprocessing step (ref: scripts/preprocess_all.sh:12).

Layout: images NHWC in (already-normalized) float32; tokens [B, N, D].
Parity vs the torch implementation is tested with random weights in
tests/test_dpt.py.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DPTConfigJ:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    image_size: int = 384  # pos-embed native grid
    out_indices: tuple[int, ...] = (2, 5, 8, 11)
    neck_hidden_sizes: tuple[int, ...] = (96, 192, 384, 768)
    reassemble_factors: tuple[float, ...] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    layer_norm_eps: float = 1e-12

    @classmethod
    def large(cls) -> "DPTConfigJ":
        return cls(
            hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096,
            out_indices=(5, 11, 17, 23),
            neck_hidden_sizes=(256, 512, 1024, 1024),
        )


def _layer_norm(x, w, b, eps):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def conv2d(x, w, b=None, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out if b is None else out + b


def _upsample_nonoverlap(x, w, b, k: int):
    """torch ConvTranspose2d with kernel == stride (no overlap):
    out[b, i*k+a, j*k+c, o] = sum_in x[b,i,j,in] * w[in,o,a,c] + b."""
    bsz, h, ww, cin = x.shape
    y = jnp.einsum("bhwi,ioac->bhawco", x, w)
    y = y.reshape(bsz, h * k, ww * k, w.shape[1])
    return y + b


def _resize_bilinear(x, new_h, new_w, align_corners: bool):
    """x: [B, H, W, C]."""
    if align_corners:
        from ..ops.grid import resize_align_corners_2d

        def one(img):
            return resize_align_corners_2d(img.transpose(2, 0, 1), new_h, new_w).transpose(1, 2, 0)

        return jax.vmap(one)(x)
    return jax.image.resize(
        x, (x.shape[0], new_h, new_w, x.shape[3]), method="bilinear"
    )


def _attention(p, x, n_heads):
    b, n, d = x.shape
    dh = d // n_heads

    def proj(w, bb):
        return (x @ w + bb).reshape(b, n, n_heads, dh).transpose(0, 2, 1, 3)

    q = proj(p["q_w"], p["q_b"])
    k = proj(p["k_w"], p["k_b"])
    v = proj(p["v_w"], p["v_b"])
    att = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(dh), axis=-1)
    out = (att @ v).transpose(0, 2, 1, 3).reshape(b, n, d)
    return out @ p["o_w"] + p["o_b"]


def _vit_layer(p, x, cfg: DPTConfigJ):
    h = _layer_norm(x, p["ln1_w"], p["ln1_b"], cfg.layer_norm_eps)
    x = x + _attention(p, h, cfg.num_heads)
    h = _layer_norm(x, p["ln2_w"], p["ln2_b"], cfg.layer_norm_eps)
    h = jax.nn.gelu(h @ p["fc1_w"] + p["fc1_b"], approximate=False)
    return x + (h @ p["fc2_w"] + p["fc2_b"])


def _backbone(params, pixels, cfg: DPTConfigJ):
    """pixels: [B, H, W, 3] normalized. Returns hook token sequences."""
    b, h, w, _ = pixels.shape
    ph, pw = h // cfg.patch_size, w // cfg.patch_size

    x = conv2d(pixels, params["patch_w"], params["patch_b"],
               stride=cfg.patch_size, padding="VALID")
    x = x.reshape(b, ph * pw, cfg.hidden_size)

    # interpolate position embeddings to the current grid (bilinear,
    # half-pixel — matches torch align_corners=False)
    pos = params["pos_embed"]  # [1, N0+1, D]
    g0 = int(round(math.sqrt(pos.shape[1] - 1)))
    pos_tok, pos_grid = pos[:, :1], pos[0, 1:]
    pos_grid = pos_grid.reshape(1, g0, g0, cfg.hidden_size)
    pos_grid = _resize_bilinear(pos_grid, ph, pw, align_corners=False)
    pos = jnp.concatenate(
        [pos_tok, pos_grid.reshape(1, ph * pw, cfg.hidden_size)], axis=1
    )

    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + pos

    hooks = []
    for i, layer in enumerate(params["layers"]):
        x = _vit_layer(layer, x, cfg)
        if i in cfg.out_indices:
            hooks.append(x)
    return hooks, (ph, pw)


def _reassemble(params, hooks, grid, cfg: DPTConfigJ):
    ph, pw = grid
    out = []
    for i, tokens in enumerate(hooks):
        cls, feat = tokens[:, 0], tokens[:, 1:]
        b, n, d = feat.shape
        # readout "project": concat cls to every token, linear + gelu
        readout = jnp.broadcast_to(cls[:, None, :], feat.shape)
        feat = jnp.concatenate([feat, readout], axis=-1)
        rp = params["readout"][i]
        feat = jax.nn.gelu(feat @ rp["w"] + rp["b"], approximate=False)
        feat = feat.reshape(b, ph, pw, d)

        rl = params["reassemble"][i]
        feat = conv2d(feat, rl["proj_w"], rl["proj_b"])  # 1x1 -> C_i
        f = cfg.reassemble_factors[i]
        if f > 1:
            feat = _upsample_nonoverlap(feat, rl["up_w"], rl["up_b"], int(f))
        elif f < 1:
            # torch Conv2d(k=3, s=2, p=1): symmetric padding (XLA's SAME
            # pads asymmetrically for even sizes at stride 2)
            feat = conv2d(
                feat, rl["down_w"], rl["down_b"], stride=int(1 / f),
                padding=((1, 1), (1, 1)),
            )
        out.append(feat)
    return out


def _residual_unit(p, x):
    h = conv2d(jax.nn.relu(x), p["c1_w"], p["c1_b"])
    h = conv2d(jax.nn.relu(h), p["c2_w"], p["c2_b"])
    return x + h


def _fusion(params, feats, cfg: DPTConfigJ):
    feats = feats[::-1]  # deepest first
    fused = None
    for p, lateral in zip(params["fusion"], feats):
        if fused is None:
            fused = lateral
        else:
            if fused.shape[1:3] != lateral.shape[1:3]:
                lateral = _resize_bilinear(
                    lateral, fused.shape[1], fused.shape[2], align_corners=False
                )
            fused = fused + _residual_unit(p["res1"], lateral)
        fused = _residual_unit(p["res2"], fused)
        fused = _resize_bilinear(
            fused, fused.shape[1] * 2, fused.shape[2] * 2, align_corners=True
        )
        fused = conv2d(fused, p["proj_w"], p["proj_b"])
    return fused


def dpt_apply(params, pixels, cfg: DPTConfigJ):
    """pixels: [B, H, W, 3] (ImageNet-normalized); H, W multiples of 32.

    Returns inverse depth [B, H, W] (four fusion x2 upsamples from H/32 plus
    the head's x2 restore the input resolution).
    """
    hooks, grid = _backbone(params, pixels, cfg)
    feats = _reassemble(params, hooks, grid, cfg)
    feats = [
        conv2d(f, params["neck_convs"][i]) for i, f in enumerate(feats)
    ]
    fused = _fusion(params, feats, cfg)

    h = params["head"]
    x = conv2d(fused, h["c1_w"], h["c1_b"])
    x = _resize_bilinear(x, x.shape[1] * 2, x.shape[2] * 2, align_corners=True)
    x = jax.nn.relu(conv2d(x, h["c2_w"], h["c2_b"]))
    x = jax.nn.relu(conv2d(x, h["c3_w"], h["c3_b"]))
    return x[..., 0]


# ----------------------------- weight conversion -----------------------------


def convert_dpt_state_dict(sd: dict, cfg: DPTConfigJ) -> dict[str, Any]:
    """HF DPTForDepthEstimation state_dict (torch tensors or numpy) -> pytree."""

    def g(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def lin(prefix):
        return g(f"{prefix}.weight").T, g(f"{prefix}.bias")

    def conv(prefix, bias=True):
        w = np.transpose(g(f"{prefix}.weight"), (2, 3, 1, 0))  # OIHW->HWIO
        return (w, g(f"{prefix}.bias")) if bias else w

    p: dict[str, Any] = {
        "cls_token": g("dpt.embeddings.cls_token"),
        "pos_embed": g("dpt.embeddings.position_embeddings"),
    }
    p["patch_w"], p["patch_b"] = conv("dpt.embeddings.patch_embeddings.projection")

    layers = []
    for i in range(cfg.num_layers):
        pre = f"dpt.encoder.layer.{i}"
        lp = {}
        lp["ln1_w"], lp["ln1_b"] = g(f"{pre}.layernorm_before.weight"), g(f"{pre}.layernorm_before.bias")
        lp["ln2_w"], lp["ln2_b"] = g(f"{pre}.layernorm_after.weight"), g(f"{pre}.layernorm_after.bias")
        lp["q_w"], lp["q_b"] = lin(f"{pre}.attention.attention.query")
        lp["k_w"], lp["k_b"] = lin(f"{pre}.attention.attention.key")
        lp["v_w"], lp["v_b"] = lin(f"{pre}.attention.attention.value")
        lp["o_w"], lp["o_b"] = lin(f"{pre}.attention.output.dense")
        lp["fc1_w"], lp["fc1_b"] = lin(f"{pre}.intermediate.dense")
        lp["fc2_w"], lp["fc2_b"] = lin(f"{pre}.output.dense")
        layers.append(lp)
    p["layers"] = layers

    p["readout"] = []
    p["reassemble"] = []
    for i, f in enumerate(cfg.reassemble_factors):
        w, b = lin(f"neck.reassemble_stage.readout_projects.{i}.0")
        p["readout"].append({"w": w, "b": b})
        rl = {}
        rl["proj_w"], rl["proj_b"] = conv(f"neck.reassemble_stage.layers.{i}.projection")
        if f > 1:
            # ConvTranspose2d weight [in, out, k, k] kept as-is for einsum
            rl["up_w"] = g(f"neck.reassemble_stage.layers.{i}.resize.weight")
            rl["up_b"] = g(f"neck.reassemble_stage.layers.{i}.resize.bias")
        elif f < 1:
            rl["down_w"], rl["down_b"] = conv(f"neck.reassemble_stage.layers.{i}.resize")
        p["reassemble"].append(rl)

    p["neck_convs"] = [conv(f"neck.convs.{i}", bias=False) for i in range(4)]

    p["fusion"] = []
    for i in range(4):
        pre = f"neck.fusion_stage.layers.{i}"
        fp = {"res1": {}, "res2": {}}
        fp["proj_w"], fp["proj_b"] = conv(f"{pre}.projection")
        for rname in ("res1", "res2"):
            torch_name = "residual_layer1" if rname == "res1" else "residual_layer2"
            fp[rname]["c1_w"], fp[rname]["c1_b"] = conv(f"{pre}.{torch_name}.convolution1")
            fp[rname]["c2_w"], fp[rname]["c2_b"] = conv(f"{pre}.{torch_name}.convolution2")
        p["fusion"].append(fp)

    h = {}
    h["c1_w"], h["c1_b"] = conv("head.head.0")
    h["c2_w"], h["c2_b"] = conv("head.head.2")
    h["c3_w"], h["c3_b"] = conv("head.head.4")
    p["head"] = h
    return p


def load_dpt_checkpoint(model_dir_or_sd, cfg: DPTConfigJ | None = None):
    """Load from a local HF snapshot dir (safetensors/bin) or a state dict."""
    if isinstance(model_dir_or_sd, dict):
        sd = model_dir_or_sd
    else:
        import torch
        from transformers import DPTForDepthEstimation

        model = DPTForDepthEstimation.from_pretrained(model_dir_or_sd)
        sd = model.state_dict()
        if cfg is None:
            c = model.config
            cfg = DPTConfigJ(
                hidden_size=c.hidden_size,
                num_layers=c.num_hidden_layers,
                num_heads=c.num_attention_heads,
                intermediate_size=c.intermediate_size,
                patch_size=c.patch_size,
                image_size=c.image_size,
                out_indices=tuple(c.backbone_out_indices),
                neck_hidden_sizes=tuple(c.neck_hidden_sizes),
                reassemble_factors=tuple(c.reassemble_factors),
                fusion_hidden_size=c.fusion_hidden_size,
                layer_norm_eps=c.layer_norm_eps,
            )
    assert cfg is not None
    return convert_dpt_state_dict(sd, cfg), cfg
