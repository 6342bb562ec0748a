"""Pallas TPU kernel: binned (sort + per-tile MXU one-hot matmul) scatter-add.

The factor-grid backward scatters are the #1 cost of the 640^3 train step
(~101 of 273 ms, PERF.md): XLA lowers every scatter-add to a sort-based
emitter running at ~17 ns/index — only ~5-9% of v5e HBM bandwidth for
128-lane rows, i.e. latency/emitter-bound, not bandwidth-bound (see PERF.md
roofline). This kernel replaces the emitter for large tables
(ref op: the autograd scatter behind models/tensoRF.py:135-191):

  1. sort the flat row indices (XLA variadic sort, ~2 ms at 1.36M),
  2. reorder the [P, C] payload into sorted order (one XLA gather),
  3. partition the sorted stream into contiguous output tiles of
     `tile_rows` rows and run ONE MXU one-hot matmul chain per tile:
         out[tile] += onehot(idx - tile_start)^T @ payload_chunk
     over only the chunks that overlap the tile (a megablocks-style
     scalar-prefetched schedule; boundary chunks are shared between
     neighboring tiles and masked by row range).

Binning removes exactly the T_tiles x P flops blow-up that makes the plain
segment-sum (ops/pallas/segsum.py) lose on plane-sized tables: each chunk is
visited by the 1-2 tiles its sorted rows span instead of by every tile.

Accumulation is f32 in VMEM regardless of payload dtype (bf16 payloads use
the MXU bf16 path), then cast to the requested output dtype once.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Grid-step count is (P/chunk + T/tile_rows) and each step carries a fixed
# ~4.7 us Mosaic overhead while the per-step MXU matmul is ~0.2 us — the
# kernel is step-count-bound, so bigger tiles/chunks win until the one-hot
# ([tile_rows, chunk] bf16) plus double-buffered payload blocks press VMEM
# (~16 MB/core). Env-overridable for the hardware sweep
# (scripts/ab_binned_shape.py). tile_rows default moved 256 -> 512 in
# round 5: the isolated sweep won at both plane shapes (640^2 rows
# 13.97 vs 15.20 ms, 404^2 6.64 vs 7.03) and the end-to-end A-B-A
# schedule run confirmed (+1.2% weighted, +2% at the 640^3 stage;
# PERF.md "Round 5: merged-split scatter", /tmp/tile_ab.log archived
# in ROUND5.md).
TILE_ROWS = int(os.environ.get("LOCALRF_BINNED_TILE_ROWS", "512"))
CHUNK = int(os.environ.get("LOCALRF_BINNED_CHUNK", "1024"))

# XLA's gather emitter has a measured TABLE-SIZE cliff on v5e: row gathers
# run at ~3.5 ns/idx on operands up to ~115 MB and fall to ~12.3 ns/idx
# above ~128 MB (measured round 4 at [rows, 128] bf16: 450k rows 3.8 ns/idx,
# 500k rows 12.3 ns/idx — PERF.md "the gather table-size cliff"). The binned
# scatter's payload-reorder gather (`g.at[order]`) operates on the [P, C]
# payload itself, which crosses the cliff at P >= ~450k bf16 rows (the
# 255^3+ stages at batch 4096) — so the point stream is split into
# under-cliff chunks, each sorted/reordered/binned independently, partials
# summed in f32. Env-overridable for hardware sweeps.
SPLIT_MAX_BYTES = int(
    os.environ.get("LOCALRF_BINNED_SPLIT_MAX_BYTES", str(100 * 2**20))
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(
    # scalar prefetch
    sched_t_ref, sched_c_ref, sched_w_ref,
    # blocked inputs
    idx_ref,  # [1, 1, CHUNK] int32 (sorted)
    g_ref,    # [CHUNK, C] payload (sorted order)
    out_ref,  # [TILE_ROWS, C] f32 accumulator (revisited across steps)
    *,
    tile_rows: int,
):
    s = pl.program_id(0)
    t = sched_t_ref[s]
    prev_t = jnp.where(s == 0, -1, sched_t_ref[jnp.maximum(s - 1, 0)])

    @pl.when(t != prev_t)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    chunk = idx_ref.shape[-1]
    local = idx_ref[0] - t * tile_rows  # [1, CHUNK]
    valid = (local >= 0) & (local < tile_rows)
    # sched_w kills trailing no-op padding steps (their clamped chunk could
    # contain rows genuinely belonging to the last tile -> double count)
    valid &= sched_w_ref[s] > 0
    local = jnp.where(valid, local, -1)
    # transposed one-hot [TILE_ROWS, CHUNK]: keeps everything >= 2D for
    # Mosaic and contracts over the chunk axis on the MXU
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_rows, chunk), 0) == local
    ).astype(g_ref.dtype)
    out_ref[:] += jax.lax.dot_general(
        onehot,
        g_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def binned_segment_sum(
    idx: jax.Array,
    g: jax.Array,
    n_rows: int,
    *,
    tile_rows: int = TILE_ROWS,
    chunk: int = CHUNK,
    out_dtype=jnp.float32,
) -> jax.Array:
    """out[n_rows, C] = sum_{p: idx_p == r} g_p, via sort + binned MXU tiles.

    idx: int32 [P] in [0, n_rows); g: [P, C] with C a multiple of 128
    preferred. Returns [n_rows, C] in `out_dtype` (accumulated in f32).
    """
    p, c = g.shape
    assert chunk % 128 == 0 and chunk > 0, (
        f"chunk must be a positive multiple of 128 (lane width), got {chunk}"
    )
    assert tile_rows % 8 == 0 and tile_rows > 0, (
        f"tile_rows must be a positive multiple of 8 (sublanes), got {tile_rows}"
    )

    # keep the payload-reorder gather under the emitter's table-size cliff
    # (see SPLIT_MAX_BYTES): split the point stream, sum f32 partials
    max_rows = max(chunk, SPLIT_MAX_BYTES // max(1, c * g.dtype.itemsize))
    if p > max_rows:
        k = -(-p // max_rows)
        csize = -(-p // k)
        out = None
        for i in range(k):
            part = binned_segment_sum(
                idx[i * csize : (i + 1) * csize],
                g[i * csize : (i + 1) * csize],
                n_rows,
                tile_rows=tile_rows,
                chunk=chunk,
                out_dtype=jnp.float32,
            )
            out = part if out is None else out + part
        return out.astype(out_dtype)

    # 1. sort indices, carrying the original position
    pos = jax.lax.iota(jnp.int32, p)
    sorted_idx, order = jax.lax.sort(
        (idx.astype(jnp.int32), pos), dimension=0, num_keys=1
    )
    # 2. payload into sorted order (XLA per-index gather — measured the
    #    binned path's floor; see PERF.md)
    g_sorted = g.at[order].get(mode="promise_in_bounds")

    # pad points to a chunk multiple with out-of-range rows (masked in-kernel)
    pad_p = (-p) % chunk
    if pad_p:
        sorted_idx = jnp.concatenate(
            [sorted_idx, jnp.full((pad_p,), n_rows, jnp.int32)]
        )
        g_sorted = jnp.pad(g_sorted, ((0, pad_p), (0, 0)))
    nc = (p + pad_p) // chunk

    pad_t = (-n_rows) % tile_rows
    n_tiles = (n_rows + pad_t) // tile_rows

    # 3. megablocks-style schedule: one grid step per (tile, overlapping
    #    chunk) pair, tiles in order. Empty tiles get one dummy step (their
    #    row-range mask matches nothing) so their output block is zeroed.
    bounds = jnp.arange(n_tiles, dtype=jnp.int32) * tile_rows
    cs = jnp.searchsorted(sorted_idx, bounds, side="left").astype(jnp.int32)
    ce = jnp.concatenate([cs[1:], jnp.array([p], jnp.int32)])
    ch_s = cs // chunk
    ch_e = (ce + chunk - 1) // chunk
    n_t = jnp.maximum(ch_e - ch_s, 1)
    s_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_t)[:-1].astype(jnp.int32)]
    )
    s_total = s_start[-1] + n_t[-1]
    s_max = nc + n_tiles  # static bound on sum(n_t)
    steps = jnp.arange(s_max, dtype=jnp.int32)
    sched_t = (
        jnp.searchsorted(s_start, steps, side="right").astype(jnp.int32) - 1
    )
    sched_c = jnp.clip(
        ch_s[sched_t] + steps - s_start[sched_t], 0, max(nc - 1, 0)
    )
    sched_w = (steps < s_total).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, tile_rows=tile_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(s_max,),
            in_specs=[
                # [nc, 1, chunk]: a (1, 1, chunk) block keeps the last two
                # dims Mosaic-legal (1 == array dim, chunk % 128 == 0)
                pl.BlockSpec((1, 1, chunk), lambda s, st, sc, sw: (sc[s], 0, 0)),
                pl.BlockSpec((chunk, c), lambda s, st, sc, sw: (sc[s], 0)),
            ],
            out_specs=pl.BlockSpec(
                (tile_rows, c), lambda s, st, sc, sw: (st[s], 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows + pad_t, c), jnp.float32),
        interpret=_interpret(),
    )(
        sched_t, sched_c, sched_w,
        sorted_idx.reshape(nc, 1, chunk),
        g_sorted,
    )
    return out[:n_rows].astype(out_dtype)


# --------------------------------------------------------------------------
# v2: merged-split single-dispatch binned scatter.
#
# v1 handles the gather cliff by recursing over under-cliff point-stream
# splits, but each split then runs its OWN pallas_call writing a FULL
# [n_rows, C] f32 partial (4 x 210 MB at the 640^3 plane shape), XLA sums
# the partials (another 1 GB of traffic), and the caller casts f32->bf16
# (315 MB more). v2 keeps the per-split sort + under-cliff payload reorder
# (measured: the sort/gather themselves are NOT the waste — see
# scripts/binned_breakdown.py) but merges ALL splits into ONE kernel whose
# schedule walks output tiles in order and, per tile, visits the overlapping
# sorted chunks of every split before moving on: the tile accumulates in a
# f32 VMEM scratch and is written to HBM exactly once, in the caller's
# requested dtype. Eliminates: (splits-1) full-size partial writes, the
# partial sum, and the astype copy.
# --------------------------------------------------------------------------


def _kernel_v2(
    # scalar prefetch
    sched_t_ref, sched_c_ref, sched_w_ref, sched_last_ref,
    # blocked inputs
    idx_ref,  # [1, 1, CHUNK] int32 (per-split sorted)
    g_ref,    # [CHUNK, C] payload (per-split sorted order)
    out_ref,  # [TILE_ROWS, C] out_dtype — written once per tile
    acc_ref,  # scratch: [TILE_ROWS, C] f32 VMEM accumulator
    *,
    tile_rows: int,
):
    s = pl.program_id(0)
    t = sched_t_ref[s]
    prev_t = jnp.where(s == 0, -1, sched_t_ref[jnp.maximum(s - 1, 0)])

    @pl.when(t != prev_t)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    chunk = idx_ref.shape[-1]
    local = idx_ref[0] - t * tile_rows  # [1, CHUNK]
    valid = (local >= 0) & (local < tile_rows)
    valid &= sched_w_ref[s] > 0  # kill padding steps (see v1)
    local = jnp.where(valid, local, -1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_rows, chunk), 0) == local
    ).astype(g_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(
        onehot,
        g_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # last step of this tile: emit in the output dtype (the only HBM write)
    @pl.when(sched_last_ref[s] > 0)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def binned_segment_sum_merged(
    idx: jax.Array,
    g: jax.Array,
    n_rows: int,
    *,
    tile_rows: int = TILE_ROWS,
    chunk: int = CHUNK,
    out_dtype=jnp.float32,
) -> jax.Array:
    """v2 of `binned_segment_sum`: same result, one pallas_call for all
    cliff splits, output written once per tile in `out_dtype`."""
    p, c = g.shape
    assert chunk % 128 == 0 and chunk > 0
    assert tile_rows % 8 == 0 and tile_rows > 0

    max_rows = max(chunk, SPLIT_MAX_BYTES // max(1, c * g.dtype.itemsize))
    n_splits = -(-p // max_rows) if p > max_rows else 1
    csize = -(-p // n_splits)

    pad_t = (-n_rows) % tile_rows
    n_tiles = (n_rows + pad_t) // tile_rows

    sidx_parts, g_parts = [], []
    # per-split chunk ranges overlapping each tile, as GLOBAL chunk ids
    ch_s_parts, ch_e_parts = [], []
    chunk_base = 0
    for i in range(n_splits):
        part = idx[i * csize : (i + 1) * csize].astype(jnp.int32)
        gp = g[i * csize : (i + 1) * csize]
        ps = part.shape[0]
        pos = jax.lax.iota(jnp.int32, ps)
        sorted_idx, order = jax.lax.sort((part, pos), dimension=0, num_keys=1)
        g_sorted = gp.at[order].get(mode="promise_in_bounds")
        pad_p = (-ps) % chunk
        if pad_p:
            sorted_idx = jnp.concatenate(
                [sorted_idx, jnp.full((pad_p,), n_rows, jnp.int32)]
            )
            g_sorted = jnp.pad(g_sorted, ((0, pad_p), (0, 0)))
        nc = (ps + pad_p) // chunk
        bounds = jnp.arange(n_tiles, dtype=jnp.int32) * tile_rows
        cs = jnp.searchsorted(sorted_idx, bounds, side="left").astype(jnp.int32)
        ce = jnp.concatenate([cs[1:], jnp.array([ps], jnp.int32)])
        ch_s_parts.append(chunk_base + cs // chunk)
        ch_e_parts.append(chunk_base + (ce + chunk - 1) // chunk)
        sidx_parts.append(sorted_idx)
        g_parts.append(g_sorted)
        chunk_base += nc

    nc_total = chunk_base
    sidx = jnp.concatenate(sidx_parts) if n_splits > 1 else sidx_parts[0]
    gs = jnp.concatenate(g_parts, axis=0) if n_splits > 1 else g_parts[0]

    # steps for tile t: concatenation of every split's overlapping chunk
    # range (>=1 dummy step if all empty, so the tile still zero-writes)
    ch_s = jnp.stack(ch_s_parts, axis=0)  # [S, T]
    ch_e = jnp.stack(ch_e_parts, axis=0)
    n_per = jnp.maximum(ch_e - ch_s, 0)   # [S, T]
    n_t = jnp.maximum(n_per.sum(axis=0), 1)  # [T]
    s_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_t)[:-1].astype(jnp.int32)]
    )
    s_total = s_start[-1] + n_t[-1]
    s_max = nc_total + n_splits * n_tiles  # static bound on sum(n_t)
    steps = jnp.arange(s_max, dtype=jnp.int32)
    sched_t = (
        jnp.searchsorted(s_start, steps, side="right").astype(jnp.int32) - 1
    )
    # offset within the tile's step run -> (split, chunk)
    off = steps - s_start[sched_t]  # [s_max]
    per_t = n_per[:, sched_t]  # [S, s_max] chunks per split for this tile
    cum = jnp.cumsum(per_t, axis=0)  # inclusive
    # split index: first s with off < cum[s]
    split_id = jnp.sum((off[None, :] >= cum).astype(jnp.int32), axis=0)
    split_id = jnp.clip(split_id, 0, n_splits - 1)
    prev_cum = cum - per_t  # exclusive cumsum
    off_in_split = off - jnp.take_along_axis(
        prev_cum, split_id[None, :], axis=0
    )[0]
    base = ch_s[split_id, sched_t]
    sched_c = jnp.clip(base + off_in_split, 0, max(nc_total - 1, 0))
    sched_w = (steps < s_total).astype(jnp.int32)
    # padding steps beyond s_total belong to the LAST tile's run; they must
    # not be marked last (sched_w masks their accumulation, and `last` on
    # the true final step already emits the tile)
    nxt = jnp.concatenate([sched_t[1:], jnp.full((1,), -2, jnp.int32)])
    sched_last = ((nxt != sched_t) | (steps == s_total - 1)) & (
        steps < s_total
    )
    sched_last = sched_last.astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel_v2, tile_rows=tile_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(s_max,),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, chunk), lambda s, st, sc, sw, sl: (sc[s], 0, 0)
                ),
                pl.BlockSpec(
                    (chunk, c), lambda s, st, sc, sw, sl: (sc[s], 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile_rows, c), lambda s, st, sc, sw, sl: (st[s], 0)
            ),
            scratch_shapes=[pltpu.VMEM((tile_rows, c), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows + pad_t, c), out_dtype),
        interpret=_interpret(),
    )(
        sched_t, sched_c, sched_w, sched_last,
        sidx.reshape(nc_total, 1, chunk),
        gs,
    )
    return out[:n_rows]


@jax.custom_vjp
def take_rows_binned(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather whose backward is the binned sort+MXU scatter-add."""
    return table.at[idx].get(mode="promise_in_bounds")


def _take_fwd(table, idx):
    # dtype carried as a zero-size array (dtype objects are not JAX types)
    proto = jnp.zeros((0,), table.dtype)
    return take_rows_binned(table, idx), (idx, table.shape[0], proto)


def _take_bwd(res, gr):
    idx, n_rows, proto = res
    return binned_segment_sum(idx, gr, n_rows, out_dtype=proto.dtype), None


take_rows_binned.defvjp(_take_fwd, _take_bwd)


# --------------------------------------------------------------------------
# Forward-fused multi-table gather with PER-SEGMENT backwards.
#
# The round-4 xplane profile shows gathers at 48.7% of the 640^3 step and
# the roofline shows each gather dispatch carries a ~4.5 ms FIXED cost
# (ns/idx falls 109.7 -> 2.6 from 42k to 5.4M indices: amortization of a
# per-dispatch overhead, not bandwidth). ONE gather over a row-concatenated
# table stack amortizes that fixed cost over all segments. The round-3
# `fused_plane_gather` fused the BACKWARD too (one 4M-index sort + one tile
# schedule) and lost 1.39x in-step; here the cotangent is sliced back into
# per-segment scatter-adds (binned kernel / XLA emitter / one-hot matmul
# per segment) that schedule independently, exactly like the unfused path.
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def take_rows_fwdfused(
    table: jax.Array, idx: jax.Array, splits: tuple, seg_bwd: tuple
):
    """One gather over a row-concatenated table stack; per-segment VJP.

    table: [splits[-1], C] — k tables stacked along rows.
    idx: [k * P] int32 — k equal-length segments in stack order, already
      offset into each table's row range.
    splits: static (0, r1, ..., n_rows).
    seg_bwd: static per-segment backward mode: "binned" (sort + MXU tiles),
      "onehot" (one-hot matmul segment-sum — small tables), or "scatter"
      (XLA emitter).
    """
    return table.at[idx].get(mode="promise_in_bounds")


def _take_ff_fwd(table, idx, splits, seg_bwd):
    proto = jnp.zeros((0,), table.dtype)
    return take_rows_fwdfused(table, idx, splits, seg_bwd), (idx, proto)


def _take_ff_bwd(splits, seg_bwd, res, gr):
    idx, proto = res
    k = len(splits) - 1
    p = idx.shape[0] // k
    d_segs = []
    for s in range(k):
        n_rows = splits[s + 1] - splits[s]
        idx_s = idx[s * p : (s + 1) * p] - splits[s]
        g_s = gr[s * p : (s + 1) * p]
        if seg_bwd[s] == "binned":
            d = binned_segment_sum(idx_s, g_s, n_rows, out_dtype=proto.dtype)
        elif seg_bwd[s] == "onehot":
            onehot = (
                idx_s[:, None]
                == jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1)
            ).astype(g_s.dtype)
            d = jax.lax.dot_general(
                onehot, g_s,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(proto.dtype)
        else:
            d = (
                jnp.zeros((n_rows, gr.shape[1]), jnp.float32)
                .at[idx_s]
                .add(g_s.astype(jnp.float32), mode="promise_in_bounds")
                .astype(proto.dtype)
            )
        d_segs.append(d)
    return jnp.concatenate(d_segs, axis=0), None


take_rows_fwdfused.defvjp(_take_ff_fwd, _take_ff_bwd)
