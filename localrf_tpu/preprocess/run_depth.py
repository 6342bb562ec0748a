"""Monocular depth preprocessing CLI: DPT inverse depth -> depth/*.png.

Analog of the reference's DPT step (ref: scripts/preprocess_all.sh:12). Two
backends:
  * `--backend transformers`: Hugging Face DPT (torch CPU) from a LOCAL
    model directory (`--model_dir`) — zero-egress friendly once weights are
    on disk;
  * `--backend torchhub`: any torch scripted module taking [1,3,H,W] in
    [0,1] and returning inverse depth.

Outputs uint16 PNG inverse-depth maps matching the reference's `depth/`
format (scaled to the per-image max).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def _save_invdepth(path, invdepth):
    import cv2

    inv = np.asarray(invdepth, np.float32)
    inv = np.clip(inv, 0, None)
    scale = 65535.0 / max(float(inv.max()), 1e-6)
    cv2.imwrite(path, (inv * scale).astype(np.uint16))


def main(argv=None):
    import cv2

    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--backend", default="jax",
                        choices=["jax", "transformers", "torchscript"])
    parser.add_argument("--model_dir", default="weights/dpt-large",
                        help="local HF model dir (e.g. Intel/dpt-large snapshot)")
    parser.add_argument("--script_path", default="weights/dpt_scripted.pt")
    parser.add_argument("--size", type=int, default=384)
    args = parser.parse_args(argv)

    img_dir = os.path.join(args.data_dir, "images")
    out_dir = os.path.join(args.data_dir, "depth")
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(os.listdir(img_dir))

    if args.backend == "jax":
        # our TPU-native DPT (weights converted from the local HF snapshot)
        import jax
        import jax.numpy as jnp

        from .dpt import dpt_apply, load_dpt_checkpoint

        params, cfg = load_dpt_checkpoint(args.model_dir)
        params = jax.tree.map(jnp.asarray, params)
        apply_jit = jax.jit(lambda p, x: dpt_apply(p, x, cfg))
        s = args.size

        def infer(img):
            x = cv2.resize(img, (s, s), interpolation=cv2.INTER_CUBIC)
            x = (x.astype(np.float32) / 255.0 - 0.5) / 0.5
            out = np.asarray(apply_jit(params, jnp.asarray(x[None])))[0]
            return cv2.resize(out, (img.shape[1], img.shape[0]),
                              interpolation=cv2.INTER_CUBIC)

    elif args.backend == "transformers":
        import torch
        from transformers import DPTForDepthEstimation, DPTImageProcessor

        processor = DPTImageProcessor.from_pretrained(args.model_dir)
        model = DPTForDepthEstimation.from_pretrained(args.model_dir).eval()

        @torch.no_grad()
        def infer(img):
            inputs = processor(images=img, return_tensors="pt")
            out = model(**inputs).predicted_depth[0].numpy()
            return cv2.resize(out, (img.shape[1], img.shape[0]),
                              interpolation=cv2.INTER_CUBIC)

    else:
        import torch

        model = torch.jit.load(args.script_path).eval()

        @torch.no_grad()
        def infer(img):
            x = torch.from_numpy(img.astype(np.float32) / 255).permute(2, 0, 1)[None]
            out = model(x)[0, 0].numpy()
            return cv2.resize(out, (img.shape[1], img.shape[0]),
                              interpolation=cv2.INTER_CUBIC)

    for i, name in enumerate(names):
        img = cv2.imread(os.path.join(img_dir, name))[..., ::-1]
        inv = infer(img)
        _save_invdepth(
            os.path.join(out_dir, f"{os.path.splitext(name)[0]}.png"), inv
        )
        if i % 20 == 0:
            print(f"depth {i}/{len(names)}")


if __name__ == "__main__":
    main()
