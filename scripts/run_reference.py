"""Driver that runs the upstream reference trainer in this environment for
the A/B parity study: applies runtime compatibility patches for newer
matplotlib/numpy APIs (the reference targets 2022-era versions), then execs
/root/reference/localTensoRF/train.py with the given CLI args.

The reference source is NEVER modified; all patching is in-process.
Needs PYTHONPATH=scripts/ref_shims for the missing packages
(configargparse, kornia, skimage, torchvision, plyfile).
"""
import os
import runpy
import sys

REF_DIR = "/root/reference/localTensoRF"


def _patch_matplotlib():
    import numpy as np
    from matplotlib.backends.backend_agg import FigureCanvasAgg

    if not hasattr(FigureCanvasAgg, "tostring_rgb"):
        def tostring_rgb(self):
            argb = np.frombuffer(self.tostring_argb(), dtype=np.uint8)
            return argb.reshape(-1, 4)[:, 1:].tobytes()

        FigureCanvasAgg.tostring_rgb = tostring_rgb


def _patch_numpy():
    import numpy as np

    if not hasattr(np, "fromstring"):
        def fromstring(s, dtype=float, count=-1, sep=""):
            return np.frombuffer(s, dtype=dtype, count=count)

        np.fromstring = fromstring


def _patch_seed():
    """AB_SEED env var overrides the reference's hardcoded RNG seed
    (train.py:648-649 calls manual_seed(20211202)) for the multi-seed
    variance study — in-process shim, reference source untouched."""
    seed = os.environ.get("AB_SEED")
    if not seed:
        return
    import numpy as np
    import torch

    orig_torch, orig_np = torch.manual_seed, np.random.seed

    def manual_seed(s):
        return orig_torch(int(seed) if s == 20211202 else s)

    def np_seed(s=None):
        return orig_np(int(seed) if s == 20211202 else s)

    torch.manual_seed = manual_seed
    np.random.seed = np_seed


def main():
    _patch_matplotlib()
    _patch_numpy()
    _patch_seed()
    os.chdir(REF_DIR)
    sys.path.insert(0, REF_DIR)
    sys.argv = ["train.py"] + sys.argv[1:]
    runpy.run_path(os.path.join(REF_DIR, "train.py"), run_name="__main__")


if __name__ == "__main__":
    main()
