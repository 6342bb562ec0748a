"""Top-K appearance compaction parity + multi-device data parallelism."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localrf_tpu.models.render import render_rays
from localrf_tpu.models.tensorf import TensorfConfig, init_tensorf

CFG = TensorfConfig(grid_size=(16, 16, 16))


def _rays(n=17):
    rng = np.random.default_rng(5)
    o = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_combined_quad_path_matches_oracle():
    """The shared-gather 128-lane combined path (fast_gather=True) must match
    the plain grid_sample oracle path bit-for-bit (same float math)."""
    params = init_tensorf(jax.random.PRNGKey(0), CFG)
    o, d = _rays()
    fast_cfg = dataclasses.replace(CFG, fast_gather=True)
    oracle_cfg = dataclasses.replace(CFG, fast_gather=False, app_top_k=0)
    rgb0, dep0 = render_rays(params, oracle_cfg, o, d, is_train=False, white_bg=True, n_samples=48)
    rgb1, dep1 = render_rays(params, fast_cfg, o, d, is_train=False, white_bg=True, n_samples=48)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dep1), np.asarray(dep0), rtol=1e-5, atol=1e-6)


def test_combined_quad_grads_match_oracle():
    params = init_tensorf(jax.random.PRNGKey(3), CFG)
    o, d = _rays(11)

    def loss(p, cfg):
        rgb, dep = render_rays(p, cfg, o, d, is_train=False, white_bg=True, n_samples=32)
        return jnp.mean(rgb**2) + 1e-2 * jnp.mean(dep**2)

    fast_cfg = dataclasses.replace(CFG, fast_gather=True)
    oracle_cfg = dataclasses.replace(CFG, fast_gather=False, app_top_k=0)
    g0 = jax.grad(loss)(params, oracle_cfg)
    g1 = jax.grad(loss)(params, fast_cfg)
    for k in g0:
        if k == "mlp":
            continue
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g0[k]), rtol=1e-4, atol=1e-6, err_msg=k
        )


def test_topk_matches_dense_when_k_covers_threshold():
    params = init_tensorf(jax.random.PRNGKey(0), CFG)
    o, d = _rays()
    dense_cfg = dataclasses.replace(CFG, app_top_k=0, fast_gather=False)
    # K = S: top-k covers every sample -> must match dense path exactly
    topk_cfg = dataclasses.replace(CFG, app_top_k=47, fast_gather=False)
    rgb0, dep0 = render_rays(params, dense_cfg, o, d, is_train=False, white_bg=True, n_samples=48)
    rgb1, dep1 = render_rays(params, topk_cfg, o, d, is_train=False, white_bg=True, n_samples=48)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dep1), np.asarray(dep0), rtol=1e-5, atol=1e-5)


def test_topk_close_with_small_k():
    """With K=16 of 48 samples, only sub-threshold contributions can differ."""
    params = init_tensorf(jax.random.PRNGKey(0), CFG)
    o, d = _rays()
    dense_cfg = dataclasses.replace(CFG, app_top_k=0, fast_gather=False)
    topk_cfg = dataclasses.replace(CFG, app_top_k=16, fast_gather=False)
    rgb0, _ = render_rays(params, dense_cfg, o, d, is_train=False, white_bg=True, n_samples=48)
    rgb1, _ = render_rays(params, topk_cfg, o, d, is_train=False, white_bg=True, n_samples=48)
    # each skipped sample contributes at most its weight (<~ mass outside top-16)
    assert float(jnp.max(jnp.abs(rgb1 - rgb0))) < 0.05


def test_topk_grads_flow():
    params = init_tensorf(jax.random.PRNGKey(0), CFG)
    o, d = _rays(8)
    cfg = dataclasses.replace(CFG, app_top_k=12, fast_gather=False)

    def loss(p):
        rgb, _ = render_rays(p, cfg, o, d, is_train=True, white_bg=False,
                             n_samples=48, key=jax.random.PRNGKey(1))
        return jnp.mean(rgb**2)

    g = jax.grad(loss)(params)
    assert float(jnp.sum(jnp.abs(g["app_plane_0"]))) > 0
    assert float(jnp.sum(jnp.abs(g["mlp"]["w1"]))) > 0


@pytest.mark.slow  # 61 s on the 1-core host; the driver runs dryrun_multichip separately every round
def test_dryrun_multichip_8cpu():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    assert len(jax.devices()) >= 8
    dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    rgb, depth = jax.jit(fn)(*args)
    assert rgb.shape == (4096, 3)
    assert np.all(np.isfinite(np.asarray(rgb)))


def test_occupancy_compaction_exact_vs_dense():
    """With occ_m large enough to hold every occupied sample, the compacted
    march must equal the dense masked march exactly."""
    import dataclasses
    from localrf_tpu.models.tensorf import update_alpha_volume

    cfg = dataclasses.replace(CFG, density_shift=-2.0)  # denser field
    params = init_tensorf(jax.random.PRNGKey(2), cfg)
    vol = update_alpha_volume(params, cfg, (10, 11, 9))
    o, d = _rays(21)

    dense_cfg = dataclasses.replace(cfg, occ_m=0)
    # 47 of 48 samples can be valid at most (terminator excluded)
    comp_cfg = dataclasses.replace(cfg, occ_m=47)
    rgb0, dep0 = render_rays(
        params, dense_cfg, o, d, is_train=False, white_bg=True,
        n_samples=48, alpha_volume=vol,
    )
    rgb1, dep1 = render_rays(
        params, comp_cfg, o, d, is_train=False, white_bg=True,
        n_samples=48, alpha_volume=vol,
    )
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dep1), np.asarray(dep0), rtol=1e-4, atol=1e-5)


def test_occupancy_pack_and_valid_match_trilinear():
    from localrf_tpu.ops.occupancy import occupancy_valid, pack_alpha_corners
    from localrf_tpu.ops.grid import grid_sample_3d

    rng = np.random.default_rng(4)
    vol = (rng.uniform(size=(9, 12, 10)) > 0.7).astype(np.float32)
    coords = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    packed = pack_alpha_corners(jnp.asarray(vol))
    fast = np.asarray(occupancy_valid(packed, vol.shape, jnp.asarray(coords)))
    tri = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords)))
    np.testing.assert_array_equal(fast, tri > 0)


def test_occupancy_row_gather_matches_scalar_gather(monkeypatch):
    """The 128-byte row-gather fast path (i>>7 row + i&127 one-hot lane) must
    be bit-identical to the scalar byte gather, on both 128-multiple and
    ragged table sizes (padding path)."""
    from localrf_tpu.ops import occupancy as occ

    rng = np.random.default_rng(11)
    for shape in ((8, 8, 8), (9, 12, 10), (16, 40, 20)):  # 512 | 1080 | 12800
        vol = (rng.uniform(size=shape) > 0.6).astype(np.float32)
        coords = rng.uniform(-1, 1, (700, 3)).astype(np.float32)
        packed = occ.pack_alpha_corners(jnp.asarray(vol))
        monkeypatch.setattr(occ, "_ROW_GATHER", True)
        fast = np.asarray(occ.occupancy_valid(packed, shape, jnp.asarray(coords)))
        monkeypatch.setattr(occ, "_ROW_GATHER", False)
        ref = np.asarray(occ.occupancy_valid(packed, shape, jnp.asarray(coords)))
        np.testing.assert_array_equal(fast, ref)


@pytest.mark.slow
def test_occupancy_compaction_grads():
    import dataclasses
    from localrf_tpu.models.tensorf import update_alpha_volume

    cfg = dataclasses.replace(CFG, density_shift=-2.0, occ_m=24)
    params = init_tensorf(jax.random.PRNGKey(2), cfg)
    vol = update_alpha_volume(params, cfg, (10, 11, 9))
    o, d = _rays(9)

    def loss(p):
        rgb, dep = render_rays(
            p, cfg, o, d, is_train=True, white_bg=False,
            n_samples=48, alpha_volume=vol, key=jax.random.PRNGKey(5),
        )
        return jnp.mean(rgb**2) + 1e-3 * jnp.mean(dep**2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


@pytest.mark.slow
def test_sample_parallel_march_matches_sequential():
    """Sequence-parallel march (parallel/sp.py): sharding the march's sample
    axis over all 8 devices and compositing segments associatively must
    reproduce the sequential render up to float re-association."""
    from localrf_tpu.parallel.sp import make_sp_mesh, render_rays_sp

    params = init_tensorf(jax.random.PRNGKey(2), CFG)
    o, d = _rays(13)
    cfg = dataclasses.replace(CFG, fast_gather=True, app_top_k=0)
    rgb0, dep0 = render_rays(params, cfg, o, d, is_train=False, white_bg=True)
    mesh = make_sp_mesh(8)
    rgb1, dep1 = render_rays_sp(params, cfg, o, d, mesh, white_bg=True)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dep1), np.asarray(dep0), rtol=1e-5, atol=2e-5)


@pytest.mark.slow
def test_sample_parallel_march_with_occupancy():
    from localrf_tpu.parallel.sp import make_sp_mesh, render_rays_sp

    params = init_tensorf(jax.random.PRNGKey(4), CFG)
    o, d = _rays(9)
    cfg = dataclasses.replace(CFG, fast_gather=True, app_top_k=0)
    rng = np.random.default_rng(0)
    vol = jnp.asarray((rng.uniform(size=(8, 8, 8)) > 0.4).astype(np.float32))
    rgb0, dep0 = render_rays(
        params, cfg, o, d, is_train=False, white_bg=True, alpha_volume=vol
    )
    mesh = make_sp_mesh(8)
    rgb1, dep1 = render_rays_sp(
        params, cfg, o, d, mesh, white_bg=True, alpha_volume=vol
    )
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dep1), np.asarray(dep0), rtol=1e-5, atol=2e-5)


@pytest.mark.slow
def test_dp_sp_2d_mesh_matches_sequential():
    """Ray-batch DP composed with sample parallelism on a 2D ("data",
    "sample") mesh (parallel/sp.make_dp_sp_mesh): rays sharded 2-way, march
    split 4-way within each shard — must reproduce the sequential render.
    SURVEY §2's parallelism plan names this composition explicitly."""
    from localrf_tpu.parallel.sp import make_dp_sp_mesh, render_rays_sp

    params = init_tensorf(jax.random.PRNGKey(2), CFG)
    o, d = _rays(16)  # divisible by the 2-way data axis
    cfg = dataclasses.replace(CFG, fast_gather=True, app_top_k=0)
    rng = np.random.default_rng(1)
    vol = jnp.asarray((rng.uniform(size=(8, 8, 8)) > 0.3).astype(np.float32))
    rgb0, dep0 = render_rays(
        params, cfg, o, d, is_train=False, white_bg=True, alpha_volume=vol
    )
    mesh = make_dp_sp_mesh(2, 4)
    assert mesh.shape == {"data": 2, "sample": 4}
    rgb1, dep1 = render_rays_sp(
        params, cfg, o, d, mesh, white_bg=True, alpha_volume=vol
    )
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dep1), np.asarray(dep0), rtol=1e-5, atol=2e-5)


def test_coarsen_alpha_conservative_at_march_scale():
    """ops/occupancy.coarsen_alpha margin claim, checked directly: for any
    point where the FINE trilinear occupancy is positive, the coarse probe at
    any point within half a probe-group's march distance (ds/2 fine voxels)
    must also be positive. This is the invariant the coarse march probe
    (cfg.occ_probe_ds) relies on to never cull an occupied sample."""
    from localrf_tpu.ops.occupancy import (
        coarsen_alpha,
        occupancy_valid,
        pack_alpha_corners,
    )

    rng = np.random.default_rng(11)
    d = 32
    ds = 4
    vol = (rng.uniform(size=(d, d, d)) > 0.97).astype(np.float32)
    coarse = coarsen_alpha(jnp.asarray(vol), ds)
    assert coarse.shape == (d // ds,) * 3
    packed_f = pack_alpha_corners(jnp.asarray(vol))
    packed_c = pack_alpha_corners(coarse)

    pts = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
    fine_ok = np.asarray(occupancy_valid(packed_f, vol.shape, jnp.asarray(pts)))
    # probe displaced by up to ds/2 fine voxels per axis (march-step units:
    # the march step is ~1 fine voxel by construction)
    off = rng.uniform(-1, 1, (4000, 3)).astype(np.float32) * (ds / 2) * (2.0 / (d - 1))
    probe_pts = np.clip(pts + off, -1, 1)
    coarse_ok = np.asarray(
        occupancy_valid(packed_c, coarse.shape, jnp.asarray(probe_pts))
    )
    missed = fine_ok & ~coarse_ok
    assert not missed.any(), f"{missed.sum()} fine-occupied points missed by coarse probe"


@pytest.mark.slow
def test_coarse_probe_matches_exact_compaction():
    """With occ_probe_ds set and no occupied group truncated, the coarse-probe
    march must reproduce the exact per-sample compaction bit-for-bit: the
    density-carrying sample set is identical (refine applies the same fine
    cull), the z values are gathers of the same indices, and compositing
    order is preserved. The test asserts its own preconditions (probe
    coverage superset of fine validity, no truncation) so a miss fails
    loudly rather than silently weakening the equality check."""
    from localrf_tpu.models.render import render_rays
    from localrf_tpu.ops.math import contract
    from localrf_tpu.ops.occupancy import occupancy_valid, pack_alpha_corners
    from localrf_tpu.ops.rays import sample_ray_contracted
    from localrf_tpu.models.tensorf import normalize_coord

    # alpha volume: fat blob around the origin region the near samples cross
    dz, dy, dx = 24, 24, 24
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, dz), np.linspace(-1, 1, dy), np.linspace(-1, 1, dx),
        indexing="ij",
    )
    vol = ((np.abs(zz) < 0.4) & (np.abs(yy) < 0.4) & (np.abs(xx) < 0.4)).astype(
        np.float32
    )
    params = init_tensorf(jax.random.PRNGKey(2), CFG)
    o, d = _rays(19)
    n_total, s, m, ds = 96, 32, 28, 2

    exact_cfg = dataclasses.replace(CFG, occ_m=m)
    probe_cfg = dataclasses.replace(CFG, occ_m=m, occ_probe_ds=ds)

    # precondition check on the actual march geometry
    viewdirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pts, _, _ = sample_ray_contracted(o, viewdirs, n_total, False, None)
    pn = normalize_coord(pts, CFG).reshape(-1, 3)
    fine_v = np.array(
        occupancy_valid(pack_alpha_corners(jnp.asarray(vol)), vol.shape, pn)
    ).reshape(-1, s)
    fine_v[:, -1] = False
    n_valid = fine_v.sum(1)
    grp_any = fine_v.reshape(-1, s // ds, ds).any(2)
    grp_any[:, -1] = False
    assert (n_valid < m).all(), "precondition: exact path must not truncate"
    assert (grp_any.sum(1) < m // ds).all(), "precondition: probe must not truncate"

    kw = dict(is_train=False, white_bg=True, n_samples=n_total,
              alpha_volume=jnp.asarray(vol))
    rgb0, dep0 = render_rays(params, exact_cfg, o, d, **kw)
    rgb1, dep1 = render_rays(params, probe_cfg, o, d, **kw)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dep1), np.asarray(dep0), rtol=1e-5, atol=1e-6)


def test_coarse_probe_grads_flow():
    from localrf_tpu.models.tensorf import update_alpha_volume

    cfg = dataclasses.replace(CFG, density_shift=-2.0, occ_m=24, occ_probe_ds=2)
    params = init_tensorf(jax.random.PRNGKey(2), cfg)
    vol = update_alpha_volume(params, cfg, (10, 11, 9))
    o, d = _rays(9)

    def loss(p):
        rgb, dep = render_rays(
            p, cfg, o, d, is_train=True, white_bg=False,
            n_samples=48, alpha_volume=vol, key=jax.random.PRNGKey(5),
        )
        return jnp.mean(rgb**2) + 1e-3 * jnp.mean(dep**2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
