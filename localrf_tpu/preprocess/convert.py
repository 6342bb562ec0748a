"""Convert official torch checkpoints (raft-things.pth, DPT) to our pytrees.

The reference downloads pretrained RAFT/DPT weights
(ref: scripts/download_weights.sh); we load the same files and remap them to
the JAX parameter trees (NHWC/HWIO layout).
"""
from __future__ import annotations

import numpy as np


def _conv_w(t):
    # torch OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(np.asarray(t), (2, 3, 1, 0)))


def _bn(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def convert_raft_checkpoint(path: str) -> dict:
    """raft-things.pth (torch, DataParallel 'module.' prefix) -> RAFT pytree."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return convert_raft_state_dict(
        {k.replace("module.", ""): v.numpy() for k, v in sd.items()}
    )


def convert_raft_state_dict(sd: dict) -> dict:
    """Stripped-prefix state dict (numpy-convertible values) -> RAFT pytree.

    Split out from the file loader so tests can wrap `sd` in a key-access
    recorder and assert every checkpoint weight is consumed (a silently
    dropped layer would otherwise only surface as a KeyError much later, or
    not at all for an optional-looking key)."""

    def conv(prefix):
        w = _conv_w(sd[f"{prefix}.weight"])
        b = sd.get(f"{prefix}.bias")
        return w, (np.asarray(b) if b is not None else np.zeros(w.shape[-1], np.float32))

    def block(prefix, kind, has_down):
        p = {}
        p["conv1_w"], p["conv1_b"] = conv(f"{prefix}.conv1")
        p["conv2_w"], p["conv2_b"] = conv(f"{prefix}.conv2")
        if kind == "batch":
            p["norm1"] = _bn(sd, f"{prefix}.norm1")
            p["norm2"] = _bn(sd, f"{prefix}.norm2")
        if has_down:
            p["down_w"], p["down_b"] = conv(f"{prefix}.downsample.0")
            if kind == "batch":
                p["norm3"] = _bn(sd, f"{prefix}.norm3")
        return p

    def enc(name, kind):
        e = {}
        e["conv1_w"], e["conv1_b"] = conv(f"{name}.conv1")
        if kind == "batch":
            e["norm1"] = _bn(sd, f"{name}.norm1")
        for li, layer in enumerate(("layer1", "layer2", "layer3"), start=1):
            has_down = layer != "layer1"
            e[layer] = [
                block(f"{name}.{layer}.0", kind, has_down),
                block(f"{name}.{layer}.1", kind, False),
            ]
        e["conv2_w"], e["conv2_b"] = conv(f"{name}.conv2")
        return e

    me = {}
    for ours, theirs in (
        ("convc1", "update_block.encoder.convc1"),
        ("convc2", "update_block.encoder.convc2"),
        ("convf1", "update_block.encoder.convf1"),
        ("convf2", "update_block.encoder.convf2"),
        ("conv", "update_block.encoder.conv"),
    ):
        me[f"{ours}_w"], me[f"{ours}_b"] = conv(theirs)

    gru = {}
    for g in ("z", "r", "q"):
        for i in ("1", "2"):
            gru[f"conv{g}{i}_w"], gru[f"conv{g}{i}_b"] = conv(
                f"update_block.gru.conv{g}{i}"
            )

    fh = {}
    fh["conv1_w"], fh["conv1_b"] = conv("update_block.flow_head.conv1")
    fh["conv2_w"], fh["conv2_b"] = conv("update_block.flow_head.conv2")

    mk = {}
    mk["conv1_w"], mk["conv1_b"] = conv("update_block.mask.0")
    mk["conv2_w"], mk["conv2_b"] = conv("update_block.mask.2")

    return {
        "fnet": enc("fnet", "instance"),
        "cnet": enc("cnet", "batch"),
        "update": {"encoder": me, "gru": gru, "flow_head": fh, "mask": mk},
    }
