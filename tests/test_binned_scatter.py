"""Binned (sort + per-tile MXU one-hot) scatter-add vs the jnp scatter
oracle — forward, backward, and the ragged schedule's edge cases
(empty tiles, single hot tile, non-multiple sizes). Runs in Pallas
interpret mode on the CPU test backend; the TPU path is exercised by
scripts/profile_scatter.py and bench.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localrf_tpu.ops.pallas.binned_scatter import (
    binned_segment_sum,
    take_rows_binned,
)


def _oracle(idx, g, n_rows):
    return jnp.zeros((n_rows, g.shape[1]), jnp.float32).at[idx].add(
        g.astype(jnp.float32)
    )


@pytest.mark.parametrize(
    "n_rows,p,dist",
    [
        (1000, 4096, "uniform"),   # rows not a tile multiple
        (512, 999, "uniform"),     # points not a chunk multiple
        (2048, 4096, "hot"),       # everything lands in one tile
        (2048, 4096, "sparse"),    # most tiles empty
        (130, 64, "uniform"),      # fewer points than one chunk
    ],
)
def test_binned_segment_sum_matches_oracle(rng, n_rows, p, dist):
    if dist == "uniform":
        idx = rng.integers(0, n_rows, size=p)
    elif dist == "hot":
        idx = rng.integers(5, 60, size=p)
    else:
        idx = rng.choice([3, n_rows - 1, n_rows // 2], size=p)
    g = rng.standard_normal((p, 128), dtype=np.float32)
    idx = jnp.asarray(idx, jnp.int32)
    g = jnp.asarray(g)

    out = binned_segment_sum(idx, g, n_rows, tile_rows=128, chunk=256)
    ref = _oracle(idx, g, n_rows)
    # accumulation order differs from the oracle's (per-chunk partial sums);
    # tolerance sized for ~1e3 f32 adds per row
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "tile_rows,chunk",
    [(64, 512), (512, 256), (128, 128)],
    ids=["wide-chunk", "tile-gt-chunk", "square"],
)
def test_binned_segment_sum_shape_sweep(rng, tile_rows, chunk):
    """The (tile_rows, chunk) shape is a hardware tuning knob
    (scripts/ab_binned_shape.py): the schedule must stay exact for any
    ratio, including chunks spanning many tiles and tiles spanning many
    chunks."""
    n_rows, p = 1000, 4096
    idx = jnp.asarray(rng.integers(0, n_rows, size=p), jnp.int32)
    g = jnp.asarray(rng.standard_normal((p, 128), dtype=np.float32))
    out = binned_segment_sum(idx, g, n_rows, tile_rows=tile_rows, chunk=chunk)
    ref = _oracle(idx, g, n_rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_binned_segment_sum_bf16_payload(rng):
    n_rows, p = 384, 2048
    idx = jnp.asarray(rng.integers(0, n_rows, size=p), jnp.int32)
    g = jnp.asarray(rng.standard_normal((p, 128)), jnp.bfloat16)
    out = binned_segment_sum(idx, g, n_rows, tile_rows=128, chunk=256)
    ref = _oracle(idx, g, n_rows)
    # bf16 inputs, f32 accumulation — matches the oracle's f32 accumulation
    # of bf16-rounded values to f32 tolerance
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


def test_take_rows_binned_grad_matches_plain_take(rng):
    n_rows, p, c = 300, 1111, 128
    table = jnp.asarray(rng.standard_normal((n_rows, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n_rows, size=p), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((p, c)), jnp.float32)

    def f_binned(t):
        return jnp.vdot(take_rows_binned(t, idx), cot)

    def f_plain(t):
        return jnp.vdot(jnp.take(t, idx, axis=0), cot)

    g_binned = jax.grad(f_binned)(table)
    g_plain = jax.grad(f_plain)(table)
    np.testing.assert_allclose(
        np.asarray(g_binned), np.asarray(g_plain), rtol=1e-5, atol=1e-5
    )


def test_take_rows_binned_bf16_table_grad_dtype(rng):
    """custom_vjp must return the cotangent in the primal (bf16) dtype; the
    f32 accumulation is rounded once at the end (XLA's scatter accumulates
    in bf16 — ours is at least as accurate)."""
    n_rows, p, c = 256, 512, 128
    table = jnp.asarray(rng.standard_normal((n_rows, c)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, n_rows, size=p), jnp.int32)

    g = jax.grad(lambda t: jnp.sum(take_rows_binned(t, idx).astype(jnp.float32)))(
        table
    )
    assert g.dtype == jnp.bfloat16
    ref = _oracle(idx, jnp.ones((p, c), jnp.float32), n_rows)
    np.testing.assert_allclose(
        np.asarray(g, np.float32), np.asarray(ref), rtol=0.01, atol=0.01
    )


def test_binned_segment_sum_split_path(rng):
    """Payloads above SPLIT_MAX_BYTES are processed in under-cliff chunks
    (round 4: XLA's gather emitter falls 3.5 -> 12.3 ns/idx above ~128 MB
    operands, so the sort-order payload reorder must stay under it). Force
    several splits and check exactness against the scatter oracle."""
    import localrf_tpu.ops.pallas.binned_scatter as bs

    orig = bs.SPLIT_MAX_BYTES
    bs.SPLIT_MAX_BYTES = 64 * 1024
    try:
        p, n_rows, c = 7111, 300, 128
        idx = jnp.asarray(rng.integers(0, n_rows, p).astype(np.int32))
        g = jnp.asarray(rng.normal(size=(p, c)).astype(np.float32))
        out = bs.binned_segment_sum(idx, g, n_rows, tile_rows=128, chunk=256)
        oracle = jnp.zeros((n_rows, c), jnp.float32).at[idx].add(g)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(oracle), rtol=1e-5, atol=1e-5
        )
    finally:
        bs.SPLIT_MAX_BYTES = orig


class TestMergedKernel:
    """v2 merged-split kernel (binned_segment_sum_merged): one dispatch for
    all cliff splits, per-tile single write in the requested out dtype."""

    @pytest.mark.parametrize(
        "n_rows,p,dist",
        [
            (1000, 4096, "uniform"),
            (512, 999, "uniform"),
            (2048, 4096, "hot"),
            (2048, 4096, "sparse"),
            (130, 64, "uniform"),
        ],
    )
    def test_matches_oracle(self, rng, n_rows, p, dist):
        from localrf_tpu.ops.pallas.binned_scatter import (
            binned_segment_sum_merged,
        )

        if dist == "uniform":
            idx = rng.integers(0, n_rows, size=p)
        elif dist == "hot":
            idx = rng.integers(5, 60, size=p)
        else:
            idx = rng.choice([3, n_rows - 1, n_rows // 2], size=p)
        g = rng.standard_normal((p, 128), dtype=np.float32)
        idx = jnp.asarray(idx, jnp.int32)
        g = jnp.asarray(g)
        out = binned_segment_sum_merged(idx, g, n_rows, tile_rows=128, chunk=256)
        assert out.dtype == jnp.float32
        ref = _oracle(idx, g, n_rows)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_multi_split_schedule(self, rng, monkeypatch):
        """Forced tiny SPLIT_MAX_BYTES: several per-split sorted streams must
        interleave correctly in the tile-major merged schedule."""
        import localrf_tpu.ops.pallas.binned_scatter as bs

        monkeypatch.setattr(bs, "SPLIT_MAX_BYTES", 256 * 128 * 4)  # 256-row splits
        p, n_rows = 2000, 777
        idx = jnp.asarray(rng.integers(0, n_rows, size=p), jnp.int32)
        g = jnp.asarray(rng.standard_normal((p, 128), dtype=np.float32))
        out = bs.binned_segment_sum_merged(idx, g, n_rows, tile_rows=64, chunk=128)
        ref = _oracle(idx, g, n_rows)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_bf16_out_dtype(self, rng):
        """out_dtype=bfloat16: accumulation stays f32 in the VMEM scratch,
        the single HBM write carries bf16."""
        from localrf_tpu.ops.pallas.binned_scatter import (
            binned_segment_sum_merged,
        )

        p, n_rows = 999, 300
        idx = jnp.asarray(rng.integers(0, n_rows, size=p), jnp.int32)
        g = jnp.asarray(rng.standard_normal((p, 128), dtype=np.float32), jnp.bfloat16)
        out = binned_segment_sum_merged(
            idx, g, n_rows, tile_rows=64, chunk=128, out_dtype=jnp.bfloat16
        )
        assert out.dtype == jnp.bfloat16
        ref = _oracle(idx, g.astype(jnp.float32), n_rows)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), rtol=0.02, atol=0.05
        )
