"""Pure-XLA grid sampling (align_corners=True, border padding).

TPU-native replacement for the torch `F.grid_sample` calls underpinning the
reference's factored-grid feature gathers (ref: models/tensoRF.py:135-191)
and 3D occupancy lookup (ref: models/tensorBase.py:53). These are the
correctness-oracle implementations; the Pallas kernels in
`localrf_tpu/ops/pallas/` fuse the same math for the hot path.

Conventions: coordinates are in [-1, 1], `align_corners=True` normalization
(-1 -> texel 0 center, +1 -> texel N-1 center), out-of-range coordinates are
clamped (border padding). Outputs are point-major [P, C] to feed the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int) -> jax.Array:
    """[-1, 1] -> [0, size-1] texel space, clamped (border padding).

    NaN coordinates (e.g. from a diverged pose) map to texel 0: the hot
    gathers run with mode='promise_in_bounds', where a NaN-derived index
    would otherwise be platform-dependent garbage instead of a deterministic
    clamp. The nan_to_num fuses into the surrounding elementwise block."""
    x = (jnp.nan_to_num(coord) + 1.0) * 0.5 * (size - 1)
    return jnp.clip(x, 0.0, size - 1)


def grid_sample_1d(line: jax.Array, coords: jax.Array) -> jax.Array:
    """Linear sampling of a stack of 1D signals.

    line: [C, D]; coords: [P] in [-1, 1]  ->  [P, C].
    """
    d = line.shape[1]
    x = _unnormalize(coords, d)
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, d - 1)
    w1 = (x - x0.astype(x.dtype))[:, None]
    v0 = jnp.take(line, x0, axis=1).T  # [P, C]
    v1 = jnp.take(line, x1, axis=1).T
    return v0 * (1.0 - w1) + v1 * w1


def grid_sample_2d(plane: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sampling of a multi-channel 2D grid.

    plane: [C, H, W]; coords: [P, 2] as (x, y) with x indexing W, y indexing H
    (torch grid_sample convention)  ->  [P, C].
    """
    c, h, w = plane.shape
    x = _unnormalize(coords[:, 0], w)
    y = _unnormalize(coords[:, 1], h)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = (x - x0.astype(x.dtype))[:, None]
    wy = (y - y0.astype(y.dtype))[:, None]

    flat = plane.reshape(c, h * w)
    i00 = y0 * w + x0
    i01 = y0 * w + x1
    i10 = y1 * w + x0
    i11 = y1 * w + x1
    v00 = jnp.take(flat, i00, axis=1).T  # [P, C]
    v01 = jnp.take(flat, i01, axis=1).T
    v10 = jnp.take(flat, i10, axis=1).T
    v11 = jnp.take(flat, i11, axis=1).T

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def grid_sample_3d(vol: jax.Array, coords: jax.Array) -> jax.Array:
    """Trilinear sampling of a single-channel 3D volume.

    vol: [D, H, W]; coords: [P, 3] as (x, y, z) with x indexing W, y indexing
    H, z indexing D (torch grid_sample convention)  ->  [P].
    """
    d, h, w = vol.shape
    x = _unnormalize(coords[:, 0], w)
    y = _unnormalize(coords[:, 1], h)
    z = _unnormalize(coords[:, 2], d)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    z1 = jnp.minimum(z0 + 1, d - 1)
    wx = x - x0.astype(x.dtype)
    wy = y - y0.astype(y.dtype)
    wz = z - z0.astype(z.dtype)

    flat = vol.reshape(-1)

    def at(zi, yi, xi):
        return jnp.take(flat, (zi * h + yi) * w + xi)

    c00 = at(z0, y0, x0) * (1 - wx) + at(z0, y0, x1) * wx
    c01 = at(z0, y1, x0) * (1 - wx) + at(z0, y1, x1) * wx
    c10 = at(z1, y0, x0) * (1 - wx) + at(z1, y0, x1) * wx
    c11 = at(z1, y1, x0) * (1 - wx) + at(z1, y1, x1) * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


# --------------------------------------------------------------------------
# Quad-packed gather layout — the TPU fast path.
#
# XLA's gather on TPU is per-index bound (~3.4 ns/row on v5e, independent of
# row width up to >=128 lanes) and its scatter-add transpose is ~5x that.
# Packing all four bilinear corners of texel (y, x) into ONE row of a derived
# [H*W, 4C] array turns 4 gathers (and 4 backward scatter-adds) per point
# into 1 — measured ~10x faster forward and ~3.7x backward at 1.9M points.
# The derived views are built with dense shifts (differentiable, ~HBM-speed)
# from the canonical [C, H, W] parameters, so optimizer state, TV, upsampling
# and checkpoints stay in the canonical layout.
#
# Border-clamp semantics match grid_sample exactly: the +1 shifted copies
# duplicate the last row/column (x1 = min(x0+1, W-1)).
# --------------------------------------------------------------------------


LANE = 128  # TPU vector lane count
# Lane padding pays only on very large tables: XLA's gather/scatter emitter
# degrades 3-5x for sub-128-lane rows once the table passes ~256k rows
# (measured on v5e: [410k, 32] gather 54 ms vs [410k, 128] 17.6 ms at 1.36M
# indices), while on smaller tables the 4x extra bytes make padding a loss.
PAD_MIN_ROWS = 262144


def _pad_lanes(rows2d: jax.Array) -> jax.Array:
    width = rows2d.shape[1]
    pad = (-width) % LANE
    if pad == 0 or rows2d.shape[0] < PAD_MIN_ROWS:
        return rows2d
    return jnp.pad(rows2d, ((0, 0), (0, pad)))


def build_quad_plane(plane: jax.Array) -> jax.Array:
    """[C, H, W] -> [H*W, 4C (lane-padded on large tables)] rows:
    [p(y,x) | p(y,x1) | p(y1,x) | p(y1,x1) | 0-pad]."""
    c, h, w = plane.shape
    px = jnp.concatenate([plane[:, :, 1:], plane[:, :, -1:]], axis=2)
    py = jnp.concatenate([plane[:, 1:, :], plane[:, -1:, :]], axis=1)
    pxy = jnp.concatenate([px[:, 1:, :], px[:, -1:, :]], axis=1)
    quad = jnp.stack([plane, px, py, pxy], axis=0)  # [4, C, H, W]
    return _pad_lanes(quad.transpose(2, 3, 0, 1).reshape(h * w, 4 * c))


def build_quad_line(line: jax.Array) -> jax.Array:
    """[C, D] -> [D, 2C] rows: [l(d) | l(d1)]."""
    ln = jnp.concatenate([line[:, 1:], line[:, -1:]], axis=1)
    return jnp.concatenate([line.T, ln.T], axis=1)


def plane_texel(h: int, w: int, coords: jax.Array):
    """coords [P, 2] as (x, y) -> (flat row index [P] i32, wx [P,1], wy [P,1]).

    The quad-packed row at `y0*w + x0` holds all 4 bilinear corners;
    (wx, wy) are the sub-texel lerp weights. Split out from quad_sample_2d
    so the fused multi-orientation gather (tensorf.compute_density_app_
    features) can batch the indices of all 3 plane tables into ONE gather."""
    x = _unnormalize(coords[:, 0], w)
    y = _unnormalize(coords[:, 1], h)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = (x - x0.astype(x.dtype))[:, None]
    wy = (y - y0.astype(y.dtype))[:, None]
    return y0 * w + x0, wx, wy


def quad_lerp_2d(rows: jax.Array, wx: jax.Array, wy: jax.Array, c: int) -> jax.Array:
    """Bilinear lerp over gathered quad rows [P, >=4C] -> [P, C].

    Lerps in the table dtype: with bf16 tables an f32 weight would promote
    every [P, 4C] row to f32 (a measured ~11 ms/step convert at 640^3);
    the weights are in [0,1] so bf16 weights lose <=2^-8 relative — the
    table entries are already bf16-rounded."""
    wx = wx.astype(rows.dtype)
    wy = wy.astype(rows.dtype)
    v00, v01, v10, v11 = (
        rows[:, :c],
        rows[:, c : 2 * c],
        rows[:, 2 * c : 3 * c],
        rows[:, 3 * c : 4 * c],
    )
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def quad_sample_2d(
    quad: jax.Array, h: int, w: int, coords: jax.Array, c: int,
    binned: bool = False,
) -> jax.Array:
    """Bilinear sample from a quad-packed plane. coords [P, 2] as (x, y);
    `c` is the channel count (rows may be lane-padded).

    binned=True routes the backward scatter-add through the binned Pallas
    kernel (sort + per-tile MXU one-hot matmuls, ops/pallas/binned_scatter)
    instead of XLA's per-index scatter emitter — profitable on large tables
    (see PERF.md)."""
    idx, wx, wy = plane_texel(h, w, coords)
    if binned:
        from .pallas.binned_scatter import take_rows_binned

        rows = take_rows_binned(quad, idx)  # [P, >=4C]
    else:
        rows = quad.at[idx].get(mode="promise_in_bounds")  # [P, >=4C]
    return quad_lerp_2d(rows, wx, wy, c)


def line_texel(d: int, coords: jax.Array):
    """coords [P] in [-1, 1] -> (row index x0 [P] i32, lerp weight w1 [P, 1]).

    Split out from quad_sample_1d so the fused multi-orientation line gather
    (tensorf.compute_density_app_features) can batch the indices of all 3
    line tables into ONE gather with static row offsets."""
    x = _unnormalize(coords, d)
    x0 = jnp.floor(x).astype(jnp.int32)
    w1 = (x - x0.astype(x.dtype))[:, None]
    return x0, w1


def quad_lerp_1d(rows: jax.Array, w1: jax.Array, c: int) -> jax.Array:
    """Linear lerp over gathered quad-line rows [P, >=2C] -> [P, C]."""
    w1 = w1.astype(rows.dtype)  # see quad_sample_2d: lerp in table dtype
    return rows[:, :c] * (1.0 - w1) + rows[:, c : 2 * c] * w1


def quad_sample_1d(
    quad: jax.Array, d: int, coords: jax.Array, c: int, mode: str = "gather"
) -> jax.Array:
    """Linear sample from a quad-packed line. coords [P] in [-1, 1].

    `mode` selects the backward for the row gather:
      - "gather": XLA scatter-add emitter (~13-14 ms at 640^3 shapes)
      - "segsum": Pallas MXU segment-sum (ops/pallas/segsum.py) — wins
        isolated but breaks XLA fusion in the fused step; opt-in
      - "onehot": pure-XLA one-hot matmul segment-sum — measured 3.3x the
        emitter at 640^3 line shapes with no fusion boundary (PERF.md r3)
    """
    x0, w1 = line_texel(d, coords)
    if mode == "segsum":
        from .pallas.segsum import take_rows

        rows = take_rows(quad, x0)
    elif mode == "onehot":
        from .pallas.segsum import take_rows_onehot

        rows = take_rows_onehot(quad, x0)
    else:
        rows = quad.at[x0].get(mode="promise_in_bounds")  # [P, >=2C]
    return quad_lerp_1d(rows, w1, c)


def resize_align_corners_2d(plane: jax.Array, new_h: int, new_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True semantics. plane: [C, H, W]."""
    ys = jnp.linspace(-1.0, 1.0, new_h)
    xs = jnp.linspace(-1.0, 1.0, new_w)
    gx, gy = jnp.meshgrid(xs, ys)  # [new_h, new_w]
    coords = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    out = grid_sample_2d(plane, coords)  # [new_h*new_w, C]
    return out.T.reshape(plane.shape[0], new_h, new_w)


def resize_align_corners_1d(line: jax.Array, new_d: int) -> jax.Array:
    """Linear resize with align_corners=True semantics. line: [C, D]."""
    coords = jnp.linspace(-1.0, 1.0, new_d)
    return grid_sample_1d(line, coords).T  # [C, new_d]
