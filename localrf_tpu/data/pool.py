"""Device-resident pixel pool: supervision data lives in HBM.

SURVEY §7's host/device split: the host async loader decodes frames; the
active window's flat pixel buffers (rgb, loss weights, invdepth, flow,
masks) are mirrored into fixed-capacity device arrays at frame granularity.
Training batches then only ship 4096 int32 indices per step instead of
~3.5 MB of gathered pixel values — the values are gathered on device inside
the jitted chunk (see models/step.py::train_chunk_pooled).

Slots are recycled as the window slides; uploads are one frame (~a few MB)
at a time, overlapped with training by the dataset's background prefetch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class DevicePixelPool:
    def __init__(self, dataset, capacity: int):
        self.ds = dataset
        self.capacity = capacity
        self.n_px = dataset.n_px_per_frame
        self.slot_of_frame: dict[int, int] = {}
        self._free = list(range(capacity))

        n = capacity * self.n_px
        self.arrays = {
            "rgbs": jnp.zeros((n, 3), jnp.float32),
            "loss_weights": jnp.zeros((n,), jnp.float32),
        }
        if dataset.load_depth:
            self.arrays["invdepths"] = jnp.zeros((n,), jnp.float32)
        if dataset.load_flow:
            for k in ("fwd_flow", "bwd_flow"):
                self.arrays[k] = jnp.zeros((n, 2), jnp.float32)
            for k in ("fwd_mask", "bwd_mask"):
                self.arrays[k] = jnp.zeros((n,), jnp.float32)

    def sync(self):
        """Mirror the dataset's active window into pool slots."""
        b0, b1 = self.ds.active_frames_bounds
        for f in list(self.slot_of_frame):
            if f < b0 or f >= b1:
                self._free.append(self.slot_of_frame.pop(f))
        for f in range(b0, b1):
            if f not in self.slot_of_frame:
                self._upload(f)

    def _upload(self, frame: int):
        b0 = self.ds.active_frames_bounds[0]
        lo = (frame - b0) * self.n_px
        sl = slice(lo, lo + self.n_px)
        if not self._free:
            raise RuntimeError("pixel pool capacity exhausted")
        slot = self._free.pop()
        dst = slice(slot * self.n_px, (slot + 1) * self.n_px)

        def put(name, host, shape_tail):
            arr = np.asarray(host, np.float32).reshape((-1,) + shape_tail)
            self.arrays[name] = jax.lax.dynamic_update_slice(
                self.arrays[name],
                jnp.asarray(arr),
                (slot * self.n_px,) + (0,) * len(shape_tail),
            )

        put("rgbs", self.ds.all_rgbs[sl], (3,))
        put("loss_weights", self.ds.all_loss_weights[sl], ())
        if self.ds.load_depth:
            put("invdepths", self.ds.all_invdepths[sl], ())
        if self.ds.load_flow:
            put("fwd_flow", self.ds.all_fwd_flow[sl], (2,))
            put("bwd_flow", self.ds.all_bwd_flow[sl], (2,))
            put("fwd_mask", self.ds.all_fwd_mask[sl], ())
            put("bwd_mask", self.ds.all_bwd_mask[sl], ())
        self.slot_of_frame[frame] = slot

    def slots_for(self, view_ids) -> np.ndarray:
        return np.asarray(
            [self.slot_of_frame[int(v)] for v in np.asarray(view_ids)], np.int32
        )
