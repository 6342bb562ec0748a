"""Minimal kornia stand-in for the reference's single use:
`create_meshgrid(H, W, normalized_coordinates=False)` -> [1, H, W, 2] (x, y)."""
import torch


def create_meshgrid(height, width, normalized_coordinates=True, device=None, dtype=None):
    if normalized_coordinates:
        xs = torch.linspace(-1.0, 1.0, width, device=device, dtype=dtype)
        ys = torch.linspace(-1.0, 1.0, height, device=device, dtype=dtype)
    else:
        xs = torch.arange(width, device=device, dtype=dtype or torch.float32)
        ys = torch.arange(height, device=device, dtype=dtype or torch.float32)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    return torch.stack([gx, gy], dim=-1)[None]
