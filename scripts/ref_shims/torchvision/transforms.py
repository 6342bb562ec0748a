import numpy as np
import torch


class ToTensor:
    """HWC uint8/float numpy -> CHW float tensor in [0,1] (PIL-free subset)."""

    def __call__(self, x):
        a = np.asarray(x)
        if a.dtype == np.uint8:
            a = a.astype(np.float32) / 255.0
        if a.ndim == 2:
            a = a[..., None]
        return torch.from_numpy(np.ascontiguousarray(a.transpose(2, 0, 1))).float()
