"""Ray-batch data parallelism over a device mesh.

The reference trains on a single GPU (ref: opt.py:197, SURVEY.md §2); its only
"distribution" is scene-per-GPU shell fan-out (ref: scripts/train_all.sh:10-22).
TPU-native scaling: shard the ray batch over ICI with `jax.sharding`,
replicate the (small) field/pose parameters, and let GSPMD insert the psum
for gradient reduction inside the jitted train step. Views stay device-local
(batch is view-major and n_views % n_devices == 0) so the per-view quantile
outlier rejection in the flow/depth losses needs no cross-device sort.

Multi-slice scaling stays embarrassingly parallel over scenes (DCN never
carries gradient traffic), mirroring train_all.sh.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# batch keys whose leading axis is the ray/view axis (shardable)
_SHARDED_KEYS = (
    "ray_idx",
    "view_ids",
    "rgbs",
    "loss_weights",
    "fwd_flow",
    "bwd_flow",
    "fwd_mask",
    "bwd_mask",
    "invdepths",
)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place batch arrays: ray-major arrays sharded over the data axis,
    everything else (gates etc.) replicated."""
    data = batch_sharding(mesh)
    repl = replicated(mesh)
    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
        elif k in _SHARDED_KEYS and v.shape[0] % mesh.size == 0:
            out[k] = jax.device_put(v, data)
        else:
            out[k] = jax.device_put(v, repl)
    return out


def replicate_tree(tree, mesh: Mesh):
    repl = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, repl), tree)
