"""Bit-packed occupancy lookup + static-shape sample compaction.

The reference culls empty space by trilinearly sampling a binary alpha
volume and skipping masked samples via ragged boolean indexing
(ref: models/tensorBase.py:51-58, 593-598). Ragged compute doesn't map to
TPU; instead:

  * the 8 trilinear corner occupancies of every voxel are packed into one
    uint8 -> the `occ > 0` test needs ONE per-point gather (TPU gathers are
    per-index bound, so this is 8x cheaper than gathering corners);
  * each ray's valid samples are compacted to a static M slots (order
    preserving), so density gathers, the transmittance scan and the
    appearance top-k all run on [R, M] instead of [R, S].

trilinear(vol, p) > 0  <=>  some corner has bit=1 AND nonzero trilinear
weight — exactly the reference's cull decision (alpha values are >= 0).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .grid import _unnormalize

# Single-byte gathers hit XLA's slow sub-lane emitter (measured 8.1 ns/idx at
# 0.69 GB/s on v5e — 11 ms for the fine cull at 640^3, see PERF.md "Round 5:
# occupancy row-gather"). Gathering one 128-byte ROW per point (i >> 7) rides
# the fast wide-row path, and the lane select (i & 127) fuses into the gather
# consumer as a one-hot mul+reduce. Env kill-switch for A/B only.
_ROW_GATHER = os.environ.get("LOCALRF_OCC_ROWGATHER", "1") != "0"


def pack_alpha_corners(vol: jax.Array) -> jax.Array:
    """Binary volume [D, H, W] -> uint8 [D*H*W]; bit k = corner (dz,dy,dx)
    occupancy with k = dz*4 + dy*2 + dx, +1 shifts edge-clamped."""
    v = vol > 0

    def shift(a, axis):
        d = a.shape[axis]
        main = jax.lax.slice_in_dim(a, 1, d, axis=axis)
        edge = jax.lax.slice_in_dim(a, d - 1, d, axis=axis)
        return jnp.concatenate([main, edge], axis=axis)

    bits = jnp.zeros(v.shape, jnp.uint8)
    k = 0
    for dz in (0, 1):
        az = shift(v, 0) if dz else v
        for dy in (0, 1):
            ay = shift(az, 1) if dy else az
            for dx in (0, 1):
                ax = shift(ay, 2) if dx else ay
                bits = bits | (ax.astype(jnp.uint8) << k)
                k += 1
    return bits.reshape(-1)


def occupancy_valid(
    packed: jax.Array, dhw: tuple[int, int, int], coords: jax.Array
) -> jax.Array:
    """coords [P, 3] as (x, y, z) in [-1, 1] -> bool [P]: trilinear occ > 0."""
    d, h, w = dhw
    fx = _unnormalize(coords[:, 0], w)
    fy = _unnormalize(coords[:, 1], h)
    fz = _unnormalize(coords[:, 2], d)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    z0 = jnp.floor(fz).astype(jnp.int32)
    wx = fx - x0.astype(fx.dtype)
    wy = fy - y0.astype(fy.dtype)
    wz = fz - z0.astype(fz.dtype)

    flat = (z0 * h + y0) * w + x0
    if _ROW_GATHER:
        n = packed.shape[0]
        n_rows = (n + 127) // 128
        tbl = packed if n_rows * 128 == n else jnp.pad(packed, (0, n_rows * 128 - n))
        g = tbl.reshape(n_rows, 128).at[flat >> 7].get(mode="promise_in_bounds")
        lane = flat & 127
        onehot = lane[:, None] == jnp.arange(128, dtype=jnp.int32)[None, :]
        byte = jnp.sum(jnp.where(onehot, g, jnp.uint8(0)).astype(jnp.int32), axis=1)
    else:
        byte = packed.at[flat].get(mode="promise_in_bounds").astype(jnp.int32)

    valid = jnp.zeros(coords.shape[0], bool)
    k = 0
    for dz in (0, 1):
        cz = (wz > 0) if dz else (wz < 1)
        for dy in (0, 1):
            cy = (wy > 0) if dy else (wy < 1)
            for dx in (0, 1):
                cx = (wx > 0) if dx else (wx < 1)
                bit = (byte >> k) & 1
                valid = valid | ((bit > 0) & cx & cy & cz)
                k += 1
    return valid


def coarsen_alpha(vol: jax.Array, ds: int) -> jax.Array:
    """Downsample a binary occupancy volume by `ds` per axis (maxpool) and
    dilate the result by one coarse voxel (3^3 maxpool).

    Used by the coarse march probe (render.py, cfg.occ_probe_ds): one
    trilinear-support lookup against the dilated coarse volume per group of
    `ds` consecutive march samples conservatively covers the fine-volume
    occupancy of every sample in the group — the march step is ~1 fine voxel
    by construction (sampling count scales with grid resolution), so a group
    spans <= ds fine voxels = 1 coarse voxel, while the dilation + trilinear
    support reach 2 coarse voxels around the probe point. Conservative-only
    errors (false positives) cost compaction slots, never correctness: the
    exact fine cull (cfg.occ_refine) still zeroes empty samples.
    """
    pooled = jax.lax.reduce_window(
        vol,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(ds, ds, ds),
        window_strides=(ds, ds, ds),
        padding=[(0, (-d) % ds) for d in vol.shape],
    )
    dilated = jax.lax.reduce_window(
        pooled,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(3, 3, 3),
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
    )
    return dilated


def compact_valid_samples(valid: jax.Array, m: int):
    """Select the first m valid sample indices per ray, in ascending order;
    the final slot is reserved for the dense terminator sample S-1.

    valid: [R, S] bool -> (sel [R, m] int32, sel_valid [R, m] bool).
    Exactly reproduces dense masked compute whenever a ray has < m valid
    samples; otherwise the farthest valid samples are dropped (they carry
    the least transmittance).
    """
    r, s = valid.shape
    idx = jnp.arange(s, dtype=jnp.int32)[None, :]
    keys = jnp.where(valid, idx, s + idx)
    neg_keys, sel = jax.lax.top_k(-keys, m)  # m smallest keys, ascending
    sel = sel.astype(jnp.int32).at[:, -1].set(s - 1)
    # validity falls out of the key values (key < s <=> valid) — no second
    # [R, m] gather needed. The forced terminator slot is always invalid:
    # callers mask valid[:, -1] = False before compacting.
    sel_valid = (-neg_keys < s).at[:, -1].set(False)
    return sel, sel_valid
