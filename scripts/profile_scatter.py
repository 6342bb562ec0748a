"""Microbench: backward-scatter strategies at the 640^3 combined-table shapes.

Candidates for grad(quad_table) given per-point grad rows g [P, C] and row
indices i [P]:
  A. plain XLA scatter-add (current; lowers to sort + segmented apply)
  B. pre-sorted scatter: one explicit sort_key_val, permute g, then
     scatter-add with indices_are_sorted=True
  C. one-hot MXU segment-sum (lines only; flops ~ P * D)
Also times the forward gathers at both dtypes for reference.
Run on the real TPU. Not part of the test suite.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    G = 640
    P = 4096 * 332
    R = G * G

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    idx_p = jax.random.randint(k1, (P,), 0, R, jnp.int32)
    idx_l = jax.random.randint(k2, (P,), 0, G, jnp.int32)

    for dt in (jnp.float32, jnp.bfloat16):
        name = dt.__name__
        tbl = jax.random.normal(k3, (R, 128)).astype(dt)
        lin = jax.random.normal(k3, (G, 64)).astype(dt)
        g_p = jax.random.normal(k1, (P, 128)).astype(dt)
        g_l = jax.random.normal(k2, (P, 64)).astype(dt)

        gather = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0).astype(jnp.float32)))
        scat = jax.jit(lambda t, i, g: jnp.sum(jnp.zeros_like(t).at[i].add(g).astype(jnp.float32)))

        def sorted_scat(t, i, g):
            si, perm = jax.lax.sort_key_val(i, jnp.arange(i.shape[0], dtype=jnp.int32))
            gs = jnp.take(g, perm, axis=0)
            out = jnp.zeros_like(t).at[si].add(gs, indices_are_sorted=True)
            return jnp.sum(out.astype(jnp.float32))

        sscat = jax.jit(sorted_scat)

        print(f"== {name} ==")
        print(f"plane gather  [{R},128] @{P}: {timeit(gather, tbl, idx_p):7.2f} ms")
        print(f"plane scatter [{R},128] @{P}: {timeit(scat, tbl, idx_p, g_p):7.2f} ms")
        print(f"plane sorted-scatter         : {timeit(sscat, tbl, idx_p, g_p):7.2f} ms")
        print(f"line gather   [{G},64]  @{P}: {timeit(gather, lin, idx_l):7.2f} ms")
        print(f"line scatter  [{G},64]  @{P}: {timeit(scat, lin, idx_l, g_l):7.2f} ms")
        print(f"line sorted-scatter          : {timeit(sscat, lin, idx_l, g_l):7.2f} ms")

        def seg_matmul(i, g):
            onehot = (
                i[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)
            ).astype(g.dtype)
            return jnp.sum(
                jax.lax.dot_general(
                    onehot, g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )

        print(f"line segsum-matmul           : {timeit(jax.jit(seg_matmul), idx_l, g_l):7.2f} ms")

    # --- binned Pallas scatter (VERDICT r3 item 1): sweep tile/chunk ---
    from localrf_tpu.ops.pallas.binned_scatter import binned_segment_sum

    g_bf = jax.random.normal(k1, (P, 128)).astype(jnp.bfloat16)
    for tile_rows in (256, 512, 1024):
        for chunk in (1024, 2048, 4096):
            fn = jax.jit(
                lambda i, g, tr=tile_rows, ck=chunk: jnp.sum(
                    binned_segment_sum(i, g, R, tile_rows=tr, chunk=ck)
                )
            )
            try:
                ms = timeit(fn, idx_p, g_bf)
                print(f"binned plane scatter tile={tile_rows:4d} chunk={chunk:4d}: {ms:7.2f} ms")
            except Exception as e:
                print(f"binned tile={tile_rows} chunk={chunk}: FAILED {type(e).__name__}: {str(e)[:200]}")

    # components of the binned path (best config measured above)
    def prep(i, g):
        si, perm = jax.lax.sort_key_val(i, jnp.arange(i.shape[0], dtype=jnp.int32))
        gs = g.at[perm].get(mode="promise_in_bounds")
        return jnp.sum(gs.astype(jnp.float32)) + jnp.sum(si)

    print(f"binned prep only (sort+reorder): {timeit(jax.jit(prep), idx_p, g_bf):7.2f} ms")

    # cost of the sort alone and occ byte-gather for context
    import jax

    sort_only = jax.jit(
        lambda i: jax.lax.sort_key_val(i, jnp.arange(i.shape[0], dtype=jnp.int32))[0][0]
    )
    print(f"sort {P} keys                : {timeit(sort_only, idx_p):7.2f} ms")
    packed = jax.random.randint(key, (320**3,), 0, 255, jnp.int32).astype(jnp.uint8)
    idx_o = jax.random.randint(k1, (4096 * 738,), 0, 320**3, jnp.int32)
    bg = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i).astype(jnp.int32)))
    print(f"occ byte-gather 3.02M        : {timeit(bg, packed, idx_o):7.2f} ms")


if __name__ == "__main__":
    main()
