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


def main():
    _patch_matplotlib()
    _patch_numpy()
    os.chdir(REF_DIR)
    sys.path.insert(0, REF_DIR)
    sys.argv = ["train.py"] + sys.argv[1:]
    runpy.run_path(os.path.join(REF_DIR, "train.py"), run_name="__main__")


if __name__ == "__main__":
    main()
