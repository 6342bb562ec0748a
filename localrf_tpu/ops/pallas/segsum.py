"""Pallas TPU kernel: sort-free segment-sum via on-the-fly one-hot matmuls.

XLA lowers every scatter-add to a full index sort (see PERF.md) — ~16 ns per
index on v5e. For tables that tile into VMEM, the same reduction is a chain
of MXU matmuls with the one-hot matrix GENERATED IN VMEM (never hitting
HBM):

    out[T, C] = sum_p onehot(idx_p)[T] * g_p[C]
              = sum over P-chunks of onehot_chunk^T @ g_chunk

The kernel grid is (T_tiles, P_chunks) with the output block revisited
across the inner P dimension, so each [T_TILE, C] accumulator stays resident
in VMEM for the whole P stream. Used as the custom VJP of row gathers into
small tables (`take_rows`): line factors at every stage, plane factors at
coarse grids.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 512
P_CHUNK = 1024
# largest table (rows) routed to the matmul segment-sum; beyond this the
# repeated g streaming across T tiles loses to XLA's sort-based scatter
MAX_ROWS = 32768


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _segsum_kernel(idx_ref, g_ref, out_ref, *, t_tile: int):
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = pl.program_id(0) * t_tile
    local = idx_ref[:] - base  # [PC]
    onehot = (
        local[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (local.shape[0], t_tile), 1)
    ).astype(jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        onehot, g_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def segment_sum_matmul(idx: jax.Array, g: jax.Array, n_rows: int) -> jax.Array:
    """out[n_rows, C] = sum_{p: idx_p == r} g_p. idx int32 [P], g [P, C]."""
    p, c = g.shape
    pad_p = (-p) % P_CHUNK
    if pad_p:
        # pad with out-of-range indices (match nothing in any tile)
        idx = jnp.concatenate([idx, jnp.full((pad_p,), -1, idx.dtype)])
        g = jnp.pad(g, ((0, pad_p), (0, 0)))
    pad_t = (-n_rows) % T_TILE
    rows_p = n_rows + pad_t

    out = pl.pallas_call(
        functools.partial(_segsum_kernel, t_tile=T_TILE),
        grid=(rows_p // T_TILE, (p + pad_p) // P_CHUNK),
        in_specs=[
            pl.BlockSpec((P_CHUNK,), lambda t, pp: (pp,), memory_space=pltpu.VMEM),
            pl.BlockSpec((P_CHUNK, c), lambda t, pp: (pp, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T_TILE, c), lambda t, pp: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_p, c), jnp.float32),
        interpret=_interpret(),
    )(idx.astype(jnp.int32), g.astype(jnp.float32))
    return out[:n_rows]


@jax.custom_vjp
def take_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather whose backward is the sort-free matmul segment-sum."""
    return jnp.take(table, idx, axis=0)


def _take_fwd(table, idx):
    return jnp.take(table, idx, axis=0), (idx, table.shape[0])


def _take_bwd(res, gr):
    idx, n_rows = res
    return segment_sum_matmul(idx, gr, n_rows), None


take_rows.defvjp(_take_fwd, _take_bwd)


# --------------------------------------------------------------------------
# Pure-XLA one-hot matmul segment-sum — no Pallas boundary, so XLA keeps
# fusing the cotangent computation into the backward. For line-sized tables
# (D <= ~1k rows) the [P, D] one-hot dot is bandwidth-bound at ~4 ms on v5e
# (1.36M x 640 bf16 one-hot materialized once) vs ~13-14 ms for XLA's
# per-index scatter emitter — measured 3.3x (scripts/profile_scatter.py).
# The Pallas variant above regressed in-step by breaking fusion; this one
# does not (PERF.md round 3).
# --------------------------------------------------------------------------


@jax.custom_vjp
def take_rows_onehot(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather whose backward is a pure-XLA one-hot matmul segment-sum."""
    return table.at[idx].get(mode="promise_in_bounds")


def _take_oh_fwd(table, idx):
    proto = jnp.zeros((0,), table.dtype)
    return take_rows_onehot(table, idx), (idx, table.shape[0], proto)


def _take_oh_bwd(res, gr):
    idx, n_rows, proto = res
    onehot = (
        idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1)
    ).astype(gr.dtype)
    out = jax.lax.dot_general(
        onehot, gr,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(proto.dtype), None


take_rows_onehot.defvjp(_take_oh_fwd, _take_oh_bwd)


# --------------------------------------------------------------------------
# Multi-segment variant: ONE forward gather over a row-concatenated stack of
# k small tables (amortizes the per-dispatch gather overhead — measured
# 4.1 -> 2.6 ns/idx from 1.36M to 5.4M indices, PERF.md roofline), with the
# backward kept as k PER-SEGMENT one-hot matmuls. A single fused one-hot
# over the [sum(D), k*P] stream would cost k^2 x the flops (T and P both
# grow k-fold); slicing the cotangent back into its k static segments keeps
# the backward at exactly the per-table cost.
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def take_rows_onehot_multi(
    table: jax.Array, idx: jax.Array, splits: tuple
) -> jax.Array:
    """Gather from a row-concatenated table stack; per-segment matmul VJP.

    table: [splits[-1], C] — k small tables stacked along rows, with table s
      occupying rows [splits[s], splits[s+1]).
    idx: [k * P] int32 — k equal-length index segments in stack order, each
      already offset into its table's row range.
    splits: static tuple (0, r1, ..., n_rows).
    """
    return table.at[idx].get(mode="promise_in_bounds")


def _take_ohm_fwd(table, idx, splits):
    proto = jnp.zeros((0,), table.dtype)
    return take_rows_onehot_multi(table, idx, splits), (idx, proto)


def _take_ohm_bwd(splits, res, gr):
    idx, proto = res
    k = len(splits) - 1
    p = idx.shape[0] // k
    outs = []
    for s in range(k):
        n_s = splits[s + 1] - splits[s]
        idx_s = idx[s * p : (s + 1) * p] - splits[s]
        gr_s = gr[s * p : (s + 1) * p]
        onehot = (
            idx_s[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, n_s), 1)
        ).astype(gr_s.dtype)
        outs.append(
            jax.lax.dot_general(
                onehot, gr_s,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(outs, axis=0).astype(proto.dtype), None


take_rows_onehot_multi.defvjp(_take_ohm_fwd, _take_ohm_bwd)
