"""TensoRF-VM factored radiance field as a functional pytree.

Re-design of the reference's `TensorVMSplit` (ref: models/tensoRF.py:10-233,
models/tensorBase.py:231-380): parameters are a flat dict of arrays, every
operation is a pure function, and coarse-to-fine upsampling returns a new
pytree (one jit bucket per resolution stage, cached across local fields).

Density: 3 planes [8, H, W] + 3 lines [8, D]; appearance: 3x [24, ., .]
planes + lines; feature = sum over planes of plane*line products; appearance
products feed a 72->27 basis matmul. matMode=[[0,1],[0,2],[1,2]],
vecMode=[2,1,0] (ref: models/tensorBase.py:274-275).
"""
from __future__ import annotations

import dataclasses
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid import (
    build_quad_line,
    build_quad_plane,
    grid_sample_1d,
    grid_sample_2d,
    grid_sample_3d,
    line_texel,
    plane_texel,
    quad_lerp_1d,
    quad_lerp_2d,
    quad_sample_1d,
    quad_sample_2d,
    resize_align_corners_1d,
    resize_align_corners_2d,
)
from ..ops.math import positional_encoding, tv_loss

MAT_MODE = ((0, 1), (0, 2), (1, 2))
VEC_MODE = (2, 1, 0)


@dataclasses.dataclass(frozen=True)
class TensorfConfig:
    """Static (hashable) field configuration. One jit bucket per grid_size."""

    grid_size: tuple[int, int, int]
    density_n_comp: tuple[int, int, int] = (8, 8, 8)
    app_n_comp: tuple[int, int, int] = (24, 24, 24)
    app_dim: int = 27
    feature_c: int = 128
    density_shift: float = -5.0
    distance_scale: float = 25.0
    ray_march_weight_thres: float = 1e-4
    alpha_mask_thres: float = 1e-4
    # TPU compaction: appearance is only shaded at the top-K samples per ray
    # by compositing weight (static-shape analog of the reference's ragged
    # `weight > thres` gather, ref: tensorBase.py:622-630). 0 = dense.
    app_top_k: int = 0
    # single-index quad-packed gathers (see ops/grid.py) — numerically
    # identical to the reference bilinear path; False = plain XLA gathers
    fast_gather: bool = True
    # dtype of the derived gather tables (canonical params stay float32 for
    # Adam/TV/upsample). "bfloat16" halves gather/scatter payload traffic;
    # grads accumulate in f32 after the scatter. Convergence-tested in
    # tests/test_golden_trajectory.py.
    gather_dtype: str = "float32"
    # compute dtype of the shading MLP + basis matmul (master weights stay
    # float32 in the optimizer). "bfloat16" runs the dots on the fast MXU
    # path; activations stay bf16 between layers, output is f32.
    mlp_dtype: str = "float32"
    # hand-written Pallas kernel for the fused alpha/transmittance/weights
    # scan with analytic VJP (ops/pallas/composite.py)
    pallas_composite: bool = False
    # backward strategy for line-factor gathers: "gather" = XLA scatter
    # emitter; "segsum" = Pallas MXU segment-sum (wins isolated, breaks
    # fusion in-step — opt-in); "onehot" = pure-XLA one-hot matmul
    # segment-sum (no fusion boundary; in-step 640^3: 272.6 -> 235.0 ms/it,
    # PERF.md r3) — the default
    line_bwd: str = "onehot"
    # legacy alias for line_bwd="segsum" (kept for checkpoint kwargs compat)
    matmul_segsum: bool = False
    # route plane-table backward scatters through the binned Pallas kernel
    # (sort + per-tile MXU one-hot matmuls, ops/pallas/binned_scatter.py)
    # instead of XLA's ~17 ns/index scatter emitter. The r3 default applied
    # it only >= 65,536 rows (640^3: 235.0 -> 225.8 ms/it; 404^3: 165.6 ->
    # 156.5); the r4 threshold sweep (scripts/ab_combo.py binned* arms,
    # PERF.md r4) measured a win at EVERY schedule stage — 64^3 26.1 -> 21.6
    # ms/it, 101^3 37.5 -> 31.6, 161^3 75.6 -> 65.3, 255^3 122.7 -> 82.1
    # (1.49x: 255^2 = 65,025 rows sat just under the old bound) — so the
    # floor now only excludes degenerate tables below one 128-row tile pair.
    binned_scatter: bool = True
    binned_min_rows: int = 2000
    # gather the 3 plane tables' rows in ONE dispatch over a row-concatenated
    # table (and ONE backward scatter). The isolated-roofline amortization
    # argument (4.1 -> 2.6 ns/idx with index count) does NOT survive in-step
    # measurement: one fused backward sorts/bins 3P indices on the critical
    # path, where three per-orientation kernels overlap their sort/bin prep
    # under the XLA scheduler — per-orientation is 1.39x faster at 404^3 and
    # 640^3 (180.3 vs 250.3 ms/it; scripts/ab_combo.py noplane arm, PERF.md
    # r3) and ties at small grids. Numerically identical either way (row
    # offsets are static); kept as an opt-in for single-kernel-count-bound
    # deployments.
    fused_plane_gather: bool = False
    # forward-fused multi-table gather with PER-SEGMENT backwards (round 4,
    # ops/pallas/binned_scatter.take_rows_fwdfused): 0 = off, 1 = the 3
    # plane tables in one gather dispatch, 2 = planes + the 3 line tables
    # (lane-padded) in one dispatch. Amortizes the measured ~4.5 ms fixed
    # per-dispatch gather cost (PERF.md roofline) without the r3
    # fused-backward serialization loss.
    fused_fwd_gather: int = 0
    # gather the 3 LINE tables' rows in ONE dispatch over a row-concatenated
    # stack (same amortization argument as fused_plane_gather), with the
    # backward kept as 3 per-orientation one-hot matmuls — a single fused
    # one-hot over the concatenated stream would cost 9x the flops (both the
    # row and point dimensions triple). Requires line_mode == "onehot";
    # falls back silently otherwise. Measured in-step on TPU
    # (scripts/ab_combo.py, 640^3): 264.8 vs 260.3 ms/it — a 1.7% LOSS
    # (line tables are small; the concat/split bookkeeping costs more than
    # the saved dispatches), so it stays opt-in.
    fused_line_gather: bool = False
    # occupancy compaction (see ops/occupancy.py): with an alpha volume
    # present, compute density only at the first occ_m occupied samples per
    # ray (static shape). 0 = dense masked compute. Exact vs the reference
    # whenever < occ_m samples of a ray are occupied.
    occ_m: int = 0
    # coarse march probe (render.py): 0 = exact per-sample cull; ds > 1 =
    # probe the ds-pooled+dilated alpha volume once per group of ds samples
    # (R*S/ds occupancy gathers instead of R*S, ds-x smaller compaction
    # top_k), then — if occ_refine — the exact fine cull at the occ_m
    # selected samples only. Conservative: may keep coarse-occupied but
    # fine-empty samples (they cost compaction slots, not correctness).
    # Default 4: wins/ties every stage in-step on TPU (scripts/ab_combo.py:
    # 640^3 250.3 vs 260.3 ms/it, 404^3 194.5 vs 196.9, 64^3 tie) and the
    # parity-scene quality gate reproduces the exact path's test PSNR
    # bit-exactly (scripts/parity_cpu.py march-probe arm, CPU_ARMS.json).
    occ_probe_ds: int = 4
    occ_refine: bool = True
    # fused Pallas march core (ops/pallas/march.py): plane-row lerp + VMEM-
    # resident line lookup + factor product + basis matmul + shading MLP in
    # ONE kernel with analytic VJP (plane gathers/scatters stay outside —
    # see the module docstring). Only active for the reference's default
    # shape config (fused_march_supported); falls back silently otherwise.
    fused_march: bool = False
    step_ratio: float = 0.5
    # user cap on samples per ray (ref: models/tensorBase.py:317-327 —
    # `nSamples = min(args.nSamples, aabbDiag/stepSize + 1)`); the computed
    # count wins below the cap, so the default is a no-op.
    n_samples_cap: int = int(1e6)
    fea2dense_act: str = "softplus"
    shading_mode: str = "MLP_Fea_late_view"
    pos_pe: int = 0
    view_pe: int = 0
    fea_pe: int = 0
    aabb_lo: tuple[float, float, float] = (-2.0, -2.0, -2.0)
    aabb_hi: tuple[float, float, float] = (2.0, 2.0, 2.0)

    @property
    def line_mode(self) -> str:
        """Effective line-gather backward mode (legacy flag wins)."""
        return "segsum" if self.matmul_segsum else self.line_bwd

    @property
    def aabb(self) -> np.ndarray:
        return np.array([self.aabb_lo, self.aabb_hi], dtype=np.float32)

    @property
    def aabb_size(self) -> np.ndarray:
        return self.aabb[1] - self.aabb[0]

    @property
    def units(self) -> np.ndarray:
        return self.aabb_size / (np.array(self.grid_size) - 1)

    @property
    def step_size(self) -> float:
        # ref: models/tensorBase.py:317-327
        return float(np.mean(self.units) * self.step_ratio)

    @property
    def n_samples(self) -> int:
        # ref: models/tensorBase.py:317-327 (min with the --nSamples cap)
        aabb_diag = float(np.linalg.norm(self.aabb_size))
        return min(int(self.n_samples_cap), int(aabb_diag / self.step_size) + 1)

    def with_grid(self, grid_size) -> "TensorfConfig":
        return dataclasses.replace(self, grid_size=tuple(int(g) for g in grid_size))


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return w, b


def init_mlp(key, cfg: TensorfConfig) -> dict[str, jax.Array]:
    """Shading head parameters for the 5 MLP variants + RGB passthrough
    (ref: models/tensorBase.py:64-229, 289-315). The default
    MLP_Fea_late_view: feat(+PE) -> featureC -> featureC, then concat
    viewdirs(+PE) -> 3. Final bias zero-initialized as in the reference."""
    mode = cfg.shading_mode
    fea = cfg.app_dim
    if mode == "RGB":
        return {}
    in_view = 0
    if mode == "MLP_Fea_late_view":
        in_mlp = 2 * cfg.fea_pe * fea + fea
        in_view = 2 * cfg.view_pe * 3 + 3
    elif mode == "MLP_Fea":
        in_mlp = 2 * cfg.view_pe * 3 + 2 * cfg.fea_pe * fea + 3 + fea
    elif mode == "MLP_Fea_woView":
        in_mlp = 2 * cfg.fea_pe * fea + fea
    elif mode == "MLP_PE":
        # note: the reference's in_mlpC arithmetic for this mode is
        # inconsistent with its own forward (dead config path); we size the
        # layer to match the actual inputs [feat, viewdirs, PE(pts), PE(view)]
        in_mlp = fea + 3 + 2 * cfg.pos_pe * 3 + 2 * cfg.view_pe * 3
    elif mode == "MLP":
        in_mlp = fea + 3 + 2 * cfg.view_pe * 3
    else:
        raise ValueError(f"unknown shading mode {mode}")
    k1, k2, k3 = jax.random.split(key, 3)
    w1, b1 = _linear_init(k1, in_mlp, cfg.feature_c)
    w2, b2 = _linear_init(k2, cfg.feature_c, cfg.feature_c)
    w3, b3 = _linear_init(k3, cfg.feature_c + in_view, 3)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": jnp.zeros_like(b3)}


def init_tensorf(key, cfg: TensorfConfig) -> dict[str, Any]:
    """Random init: factor grids 0.1*randn, basis/MLP torch-Linear-style."""
    keys = jax.random.split(key, 14)
    params: dict[str, Any] = {}
    g = cfg.grid_size
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        params[f"density_plane_{i}"] = 0.1 * jax.random.normal(
            keys[i], (cfg.density_n_comp[i], g[m1], g[m0])
        )
        params[f"density_line_{i}"] = 0.1 * jax.random.normal(
            keys[3 + i], (cfg.density_n_comp[i], g[v])
        )
        params[f"app_plane_{i}"] = 0.1 * jax.random.normal(
            keys[6 + i], (cfg.app_n_comp[i], g[m1], g[m0])
        )
        params[f"app_line_{i}"] = 0.1 * jax.random.normal(
            keys[9 + i], (cfg.app_n_comp[i], g[v])
        )
    bound = 1.0 / math.sqrt(sum(cfg.app_n_comp))
    params["basis_mat"] = jax.random.uniform(
        keys[12], (sum(cfg.app_n_comp), cfg.app_dim), jnp.float32, -bound, bound
    )
    params["mlp"] = init_mlp(keys[13], cfg)
    return params


def normalize_coord(pts: jax.Array, cfg: TensorfConfig) -> jax.Array:
    """World (contracted) coords -> [-1, 1] grid coords."""
    aabb_lo = jnp.asarray(cfg.aabb_lo)
    inv = 2.0 / jnp.asarray(cfg.aabb_size)
    return (pts - aabb_lo) * inv - 1.0


def build_quad_views(params, cfg: TensorfConfig, kinds=("density", "app")) -> dict:
    """Derive the quad-packed gather views for the hot path (see ops/grid.py).

    Built once per jitted step from the canonical parameters; the dense shift
    construction is differentiable, so gradients flow back into the canonical
    planes/lines as cheap dense reductions instead of 4x scatter-adds.
    """
    views = {}
    for kind in kinds:
        for i in range(3):
            views[f"{kind}_plane_{i}"] = build_quad_plane(params[f"{kind}_plane_{i}"])
            views[f"{kind}_line_{i}"] = build_quad_line(params[f"{kind}_line_{i}"])
    return views


def build_combined_quad_views(params, cfg: TensorfConfig) -> dict:
    """Quad views with density and appearance factors FUSED per orientation.

    Concatenating the [8, H, W] density and [24, H, W] appearance planes
    channel-wise before quad-packing yields rows of exactly 4*(8+24) = 128
    lanes — one full TPU vector register — so ONE per-point gather (and one
    backward scatter-sort) serves both the density and appearance features
    that the reference computes with separate `F.grid_sample` calls
    (ref: models/tensoRF.py:112-196). Lines fuse to [D, 2*32] = 64 lanes.
    Measured: halves the dominant gather/scatter cost of the train step.
    """
    views = {}
    for i in range(3):
        plane = jnp.concatenate(
            [params[f"density_plane_{i}"], params[f"app_plane_{i}"]], axis=0
        )
        line = jnp.concatenate(
            [params[f"density_line_{i}"], params[f"app_line_{i}"]], axis=0
        )
        if cfg.gather_dtype != "float32":
            plane = plane.astype(cfg.gather_dtype)
            line = line.astype(cfg.gather_dtype)
        views[f"comb_plane_{i}"] = build_quad_plane(plane)
        views[f"comb_line_{i}"] = build_quad_line(line)
    return views


def compute_density_app_features(
    params, pts: jax.Array, cfg: TensorfConfig, quad: dict
) -> tuple[jax.Array, jax.Array]:
    """Density feature [P] and appearance feature [P, app_dim] from ONE
    shared gather per orientation (see build_combined_quad_views).

    Numerically identical to compute_density_feature + compute_app_feature
    (ref: models/tensoRF.py:112-196); the weight>thres appearance masking is
    applied downstream by the renderer exactly as the reference's ragged
    gather does.
    """
    sigma = 0.0
    prods = []
    g = cfg.grid_size
    tables = [quad[f"comb_plane_{i}"] for i in range(3)]
    cds = [params[f"density_plane_{i}"].shape[0] for i in range(3)]
    cas = [params[f"app_plane_{i}"].shape[0] for i in range(3)]
    # fused multi-orientation gather: all 3 tables share one row width when
    # the per-orientation channel counts match (the reference's defaults)
    fused = cfg.fused_plane_gather and len({t.shape[1] for t in tables}) == 1
    plane_rows = [None, None, None]
    line_feats = [None, None, None]
    # forward-fused gather with PER-SEGMENT backwards (round 4): one gather
    # dispatch amortizes the measured ~4.5 ms fixed per-dispatch cost over
    # all plane (and optionally line) tables while the backward stays
    # per-orientation (the r3 fused-backward serialization loss does not
    # apply). See ops/pallas/binned_scatter.take_rows_fwdfused.
    fwdfused = (
        cfg.fused_fwd_gather > 0
        and not fused
        and len({t.shape[1] for t in tables}) == 1
    )
    if fwdfused:
        from ..ops.pallas.binned_scatter import take_rows_fwdfused

        width = tables[0].shape[1]
        lines_q = [quad[f"comb_line_{i}"] for i in range(3)]
        include_lines = (
            cfg.fused_fwd_gather >= 2
            and cfg.line_mode == "onehot"
            and all(ln.shape[1] <= width for ln in lines_q)
        )
        segs, idxs, seg_bwd = [], [], []
        wxs, wys, w1s_ff = [], [], []
        off = 0
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            idx, wx, wy = plane_texel(g[m1], g[m0], pts[:, (m0, m1)])
            segs.append(tables[i])
            idxs.append(idx + off)
            off += tables[i].shape[0]
            seg_bwd.append(
                "binned"
                if cfg.binned_scatter and tables[i].shape[0] >= cfg.binned_min_rows
                else "scatter"
            )
            wxs.append(wx)
            wys.append(wy)
        if include_lines:
            for i in range(3):
                x0, w1 = line_texel(g[VEC_MODE[i]], pts[:, VEC_MODE[i]])
                ln = lines_q[i]
                if ln.shape[1] < width:
                    ln = jnp.pad(ln, ((0, 0), (0, width - ln.shape[1])))
                segs.append(ln)
                idxs.append(x0 + off)
                off += ln.shape[0]
                seg_bwd.append("onehot")
                w1s_ff.append(w1)
        splits = (0,)
        for t in segs:
            splits += (splits[-1] + t.shape[0],)
        big = jnp.concatenate(segs, axis=0)
        rows_all = take_rows_fwdfused(
            big, jnp.concatenate(idxs), splits, tuple(seg_bwd)
        )
        p = pts.shape[0]
        plane_rows = [
            quad_lerp_2d(
                rows_all[i * p : (i + 1) * p], wxs[i], wys[i], cds[i] + cas[i]
            )
            for i in range(3)
        ]
        if include_lines:
            line_feats = [
                quad_lerp_1d(
                    rows_all[(3 + i) * p : (4 + i) * p][
                        :, : 2 * (cds[i] + cas[i])
                    ],
                    w1s_ff[i],
                    cds[i] + cas[i],
                )
                for i in range(3)
            ]
    if fused:
        idxs, wxs, wys = [], [], []
        off = 0
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            idx, wx, wy = plane_texel(g[m1], g[m0], pts[:, (m0, m1)])
            idxs.append(idx + off)
            wxs.append(wx)
            wys.append(wy)
            off += tables[i].shape[0]
        big = jnp.concatenate(tables, axis=0)
        idx_all = jnp.concatenate(idxs)
        if cfg.binned_scatter and big.shape[0] >= cfg.binned_min_rows:
            from ..ops.pallas.binned_scatter import take_rows_binned

            rows_all = take_rows_binned(big, idx_all)
        else:
            rows_all = big.at[idx_all].get(mode="promise_in_bounds")
        p = pts.shape[0]
        plane_rows = [
            quad_lerp_2d(rows_all[i * p : (i + 1) * p], wxs[i], wys[i], cds[i] + cas[i])
            for i in range(3)
        ]
    # fused multi-orientation LINE gather: one dispatch over the 3 stacked
    # quad-line tables, backward = 3 per-orientation one-hot matmuls
    # (take_rows_onehot_multi). Same-width rows required (default channels).
    lines = [quad[f"comb_line_{i}"] for i in range(3)]
    fused_line = (
        cfg.fused_line_gather
        and line_feats[0] is None
        and cfg.line_mode == "onehot"
        and len({ln.shape[1] for ln in lines}) == 1
    )
    if fused_line:
        from ..ops.pallas.segsum import take_rows_onehot_multi

        splits, idxs, w1s = [0], [], []
        for i in range(3):
            x0, w1 = line_texel(g[VEC_MODE[i]], pts[:, VEC_MODE[i]])
            idxs.append(x0 + splits[-1])
            w1s.append(w1)
            splits.append(splits[-1] + lines[i].shape[0])
        rows_ln = take_rows_onehot_multi(
            jnp.concatenate(lines, axis=0), jnp.concatenate(idxs), tuple(splits)
        )
        p = pts.shape[0]
        line_feats = [
            quad_lerp_1d(rows_ln[i * p : (i + 1) * p], w1s[i], cds[i] + cas[i])
            for i in range(3)
        ]
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        cd, ca = cds[i], cas[i]
        c = cd + ca
        if plane_rows[i] is not None:
            pf = plane_rows[i]
        else:
            binned = (
                cfg.binned_scatter
                and quad[f"comb_plane_{i}"].shape[0] >= cfg.binned_min_rows
            )
            pf = quad_sample_2d(
                quad[f"comb_plane_{i}"], g[m1], g[m0], pts[:, (m0, m1)], c, binned
            )
        if line_feats[i] is not None:
            lf = line_feats[i]
        else:
            lf = quad_sample_1d(
                quad[f"comb_line_{i}"], g[v], pts[:, v], c, cfg.line_mode
            )
        prod = pf * lf  # [P, cd+ca]
        sigma = sigma + jnp.sum(prod[:, :cd].astype(jnp.float32), axis=-1)
        prods.append(prod[:, cd:])
    feat = jnp.concatenate(prods, axis=-1)  # [P, sum(app_n_comp)]
    basis = params["basis_mat"].astype(feat.dtype)
    app = jnp.dot(feat, basis, preferred_element_type=jnp.float32)
    return sigma, app


def compute_density_feature(params, pts: jax.Array, cfg=None, quad=None) -> jax.Array:
    """Raw density feature at normalized points [P, 3] -> [P].

    feature = sum_planes sum_c plane_c(x_m0, x_m1) * line_c(x_v)
    (ref: models/tensoRF.py:112-151). With `quad` views (and cfg), uses the
    single-index quad gather fast path — numerically identical.
    """
    out = 0.0
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        if quad is not None:
            g = cfg.grid_size
            c = params[f"density_plane_{i}"].shape[0]
            pf = quad_sample_2d(
                quad[f"density_plane_{i}"], g[m1], g[m0], pts[:, (m0, m1)], c
            )
            lf = quad_sample_1d(
                quad[f"density_line_{i}"], g[v], pts[:, v], c, cfg.line_mode
            )
        else:
            pf = grid_sample_2d(params[f"density_plane_{i}"], pts[:, (m0, m1)])
            lf = grid_sample_1d(params[f"density_line_{i}"], pts[:, v])
        out = out + jnp.sum(pf * lf, axis=-1)
    return out


def compute_app_feature(params, pts: jax.Array, cfg=None, quad=None) -> jax.Array:
    """Appearance feature at normalized points [P, 3] -> [P, app_dim]."""
    prods = []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        if quad is not None:
            g = cfg.grid_size
            c = params[f"app_plane_{i}"].shape[0]
            pf = quad_sample_2d(
                quad[f"app_plane_{i}"], g[m1], g[m0], pts[:, (m0, m1)], c
            )
            lf = quad_sample_1d(
                quad[f"app_line_{i}"], g[v], pts[:, v], c, cfg.line_mode
            )
        else:
            pf = grid_sample_2d(params[f"app_plane_{i}"], pts[:, (m0, m1)])
            lf = grid_sample_1d(params[f"app_line_{i}"], pts[:, v])
        prods.append(pf * lf)
    feat = jnp.concatenate(prods, axis=-1)  # [P, sum(app_n_comp)]
    return feat @ params["basis_mat"]


def feature2density(feat: jax.Array, cfg: TensorfConfig) -> jax.Array:
    if cfg.fea2dense_act == "softplus":
        return jax.nn.softplus(feat + cfg.density_shift)
    if cfg.fea2dense_act == "relu":
        return jax.nn.relu(feat)
    raise ValueError(cfg.fea2dense_act)


def apply_mlp(
    mlp, pts: jax.Array, viewdirs: jax.Array, features: jax.Array, cfg: TensorfConfig,
    refine=1.0,
) -> jax.Array:
    """Shading head dispatch (ref: models/tensorBase.py:64-229, 289-315).

    Default MLP_Fea_late_view: `refine` is a traced 0/1 scalar — during the
    coarse phase (refine=0) the feature-PE inputs are zeroed, matching the
    reference's zero-padding branch (ref: models/tensorBase.py:115-135)
    without retracing when the phase flips."""
    mode = cfg.shading_mode
    if mode == "RGB":
        return features

    dt = jnp.dtype(cfg.mlp_dtype)

    def dot(x, w, out_dt):
        # MXU accumulates f32 internally either way; hidden layers emit the
        # compute dtype so bias/relu stay in it (no f32<->bf16 round trips
        # between layers), the final layer emits f32 for the sigmoid/loss
        return jax.lax.dot_general(
            x.astype(dt), w.astype(dt), (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=out_dt,
        )

    def run(x, view_extra=()):
        x = jax.nn.relu(dot(x, mlp["w1"], dt) + mlp["b1"].astype(dt))
        x = jax.nn.relu(dot(x, mlp["w2"], dt) + mlp["b2"].astype(dt))
        if view_extra:
            x = jnp.concatenate([x, *(v.astype(dt) for v in view_extra)], axis=-1)
        return jax.nn.sigmoid(dot(x, mlp["w3"], jnp.float32) + mlp["b3"])

    if mode == "MLP_Fea_late_view":
        indata = [features]
        if cfg.fea_pe > 0:
            pe = positional_encoding(features, cfg.fea_pe)
            indata.append(pe * jnp.asarray(refine, pe.dtype))
        view_in = [viewdirs]
        if cfg.view_pe > 0:
            view_in.append(positional_encoding(viewdirs, cfg.view_pe))
        return run(jnp.concatenate(indata, axis=-1), view_in)

    if mode == "MLP_Fea":
        indata = [features, viewdirs]
        if cfg.fea_pe > 0:
            indata.append(positional_encoding(features, cfg.fea_pe))
        if cfg.view_pe > 0:
            indata.append(positional_encoding(viewdirs, cfg.view_pe))
        return run(jnp.concatenate(indata, axis=-1))

    if mode == "MLP_Fea_woView":
        indata = [features]
        if cfg.fea_pe > 0:
            indata.append(positional_encoding(features, cfg.fea_pe))
        return run(jnp.concatenate(indata, axis=-1))

    if mode == "MLP_PE":
        indata = [features, viewdirs]
        if cfg.pos_pe > 0:
            indata.append(positional_encoding(pts, cfg.pos_pe))
        if cfg.view_pe > 0:
            indata.append(positional_encoding(viewdirs, cfg.view_pe))
        return run(jnp.concatenate(indata, axis=-1))

    if mode == "MLP":
        indata = [features, viewdirs]
        if cfg.view_pe > 0:
            indata.append(positional_encoding(viewdirs, cfg.view_pe))
        return run(jnp.concatenate(indata, axis=-1))

    raise ValueError(f"unknown shading mode {mode}")


def sample_alpha(alpha_volume: jax.Array, pts: jax.Array, cfg: TensorfConfig):
    """Occupancy lookup: trilinear sample of the binary alpha volume at
    normalized coords (ref: models/tensorBase.py:51-58)."""
    return grid_sample_3d(alpha_volume, normalize_coord(pts, cfg))


# ----------------------------- regularizers -----------------------------


def tv_loss_density(params) -> jax.Array:
    """TV on density planes (1e-2) and lines (1e-3) (ref: tensoRF.py:94-101)."""
    total = 0.0
    for i in range(3):
        plane = params[f"density_plane_{i}"][:, None]  # [C, 1, H, W]
        line = params[f"density_line_{i}"][:, None, :, None]  # [C, 1, D, 1]
        total = total + tv_loss(plane) * 1e-2 + tv_loss(line) * 1e-3
    return total


def tv_loss_app(params) -> jax.Array:
    total = 0.0
    for i in range(3):
        plane = params[f"app_plane_{i}"][:, None]
        line = params[f"app_line_{i}"][:, None, :, None]
        total = total + tv_loss(plane) * 1e-2 + tv_loss(line) * 1e-3
    return total


def vector_comp_diffs(params) -> jax.Array:
    """Mean |off-diagonal| of the line-factor Gram matrices — the reference's
    component-orthogonality diagnostic (ref: models/tensoRF.py:66-81)."""
    total = 0.0
    for kind in ("density", "app"):
        for i in range(3):
            line = params[f"{kind}_line_{i}"]  # [C, D]
            gram = line @ line.T
            c = gram.shape[0]
            off = gram * (1.0 - jnp.eye(c, dtype=gram.dtype))
            total = total + jnp.sum(jnp.abs(off)) / (c * (c - 1))
    return total


def _l1_block_size(d_sizes, n_vox: int, target: int = 512_000) -> int:
    """Largest B <= ~target that is a multiple of every line length and a
    divisor of n_vox (0 if none exists — non-commensurate grid)."""
    lcm = 1
    for d in d_sizes:
        lcm = lcm * d // math.gcd(lcm, d)
    if lcm > n_vox or n_vox % lcm:
        return 0
    q = n_vox // lcm
    for k in range(min(q, max(1, target // lcm)), 0, -1):
        if q % k == 0:
            return lcm * k
    return lcm


def _density_l1_streamed(params, cfg: TensorfConfig, n_vox: int, blk: int) -> jax.Array:
    """Blockwise density_l1: same per-voxel math as the dense path, but the
    [n_vox] outer-product volume is produced one VMEM-sized block at a time
    inside a rematerialized scan, so neither forward nor backward ever
    writes the dense grid to HBM (PERF.md "Round 5: streamed density L1";
    the dense path cost 26 ms of the 154 ms step at 640^3)."""
    planes = [
        params[f"density_plane_{i}"].reshape(params[f"density_plane_{i}"].shape[0], -1)
        for i in range(3)
    ]  # [C, P_i]
    lines = [params[f"density_line_{i}"] for i in range(3)]  # [C, D_i]
    rows = [blk // lines[i].shape[1] for i in range(3)]

    def body(acc, b):
        feat = jnp.zeros((blk,), jnp.float32)
        for i in range(3):
            sl = jax.lax.dynamic_slice(
                planes[i], (0, b * rows[i]), (planes[i].shape[0], rows[i])
            )
            feat = feat + jnp.einsum("cp,cd->pd", sl, lines[i]).reshape(blk)
        sigmas = feature2density(feat, cfg)
        return acc + jnp.sum(jnp.sqrt(jnp.clip(sigmas, 1e-5, None))), None

    acc, _ = jax.lax.scan(
        jax.checkpoint(body),
        jnp.zeros((), jnp.float32),
        jnp.arange(n_vox // blk, dtype=jnp.int32),
    )
    return acc / n_vox


_L1_STREAM = os.environ.get("LOCALRF_L1_STREAM", "1") != "0"
_L1_STREAM_MIN_VOX = int(os.environ.get("LOCALRF_L1_STREAM_MIN_VOX", str(4 * 2**20)))


def density_l1(params, cfg: TensorfConfig) -> jax.Array:
    """mean sqrt(density) over the full outer-product grid.

    Reproduces the reference's exact (layout-quirky) accumulation where each
    plane's [P, D] outer product is flattened in its own axis order before
    the three are summed elementwise (ref: models/tensoRF.py:83-92). Above
    _L1_STREAM_MIN_VOX voxels the blockwise path is used: identical
    per-voxel values, only the mean's f32 accumulation order differs (the
    dense path materializes ~n_vox*4 bytes several times per step in both
    forward and backward — 26 ms/step at 640^3, see PERF.md)."""
    n_vox = int(np.prod(cfg.grid_size))
    d_sizes = [params[f"density_line_{i}"].shape[1] for i in range(3)]
    blk = _l1_block_size(d_sizes, n_vox)
    if _L1_STREAM and n_vox >= _L1_STREAM_MIN_VOX and blk:
        return _density_l1_streamed(params, cfg, n_vox, blk)
    sigma_feature = jnp.zeros((n_vox,), jnp.float32)
    for i in range(3):
        plane = params[f"density_plane_{i}"].reshape(
            params[f"density_plane_{i}"].shape[0], -1
        )  # [C, P]
        line = params[f"density_line_{i}"]  # [C, D]
        prod = jnp.einsum("cp,cd->pd", plane, line).reshape(-1)
        sigma_feature = sigma_feature + prod
    sigmas = feature2density(sigma_feature, cfg)
    return jnp.mean(jnp.sqrt(jnp.clip(sigmas, 1e-5, None)))


# ----------------------------- upsampling -----------------------------


def upsample_tensorf(params, cfg: TensorfConfig, new_grid) -> tuple[dict, TensorfConfig]:
    """Bilinear align_corners upsample of all factor grids to `new_grid`
    (ref: models/tensoRF.py:198-233). Returns (new params, new config)."""
    new_cfg = cfg.with_grid(new_grid)
    g = new_cfg.grid_size
    out = dict(params)
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        for kind in ("density", "app"):
            out[f"{kind}_plane_{i}"] = resize_align_corners_2d(
                params[f"{kind}_plane_{i}"], g[m1], g[m0]
            )
            out[f"{kind}_line_{i}"] = resize_align_corners_1d(
                params[f"{kind}_line_{i}"], g[v]
            )
    return out, new_cfg


# ----------------------------- alpha mask -----------------------------


# one alpha-lattice slab per sequential step above this many total points:
# an unchunked 640^3 eval materializes a [262M, 128] gather intermediate
# (~67 GB) and OOMs — found by the round-4 full-scale parity run. The
# reference evaluates its dense alpha plane-by-plane for the same reason
# (ref: models/tensorBase.py:501-515 loops over gridSize[2]).
_DENSE_ALPHA_CHUNK_PTS = 2_097_152


def compute_dense_alpha(params, cfg: TensorfConfig, grid_size) -> jax.Array:
    """Dense alpha at `grid_size` lattice points over the aabb
    (ref: models/tensorBase.py:501-515). Returns [gx, gy, gz].

    Evaluated in x-slabs via a sequential lax.map once the lattice exceeds
    _DENSE_ALPHA_CHUNK_PTS, bounding the gather working set to one slab."""
    gx, gy, gz = (int(v) for v in grid_size)
    xs = jnp.linspace(0.0, 1.0, gx)
    ys = jnp.linspace(0.0, 1.0, gy)
    zs = jnp.linspace(0.0, 1.0, gz)
    aabb = jnp.asarray(cfg.aabb)
    quad = build_quad_views(params, cfg, kinds=("density",)) if cfg.fast_gather else None

    def eval_pts(grid01):
        pts = aabb[0] * (1.0 - grid01) + aabb[1] * grid01
        pts_flat = normalize_coord(pts.reshape(-1, 3), cfg)
        feat = compute_density_feature(params, pts_flat, cfg, quad)
        sigma = feature2density(feat, cfg)
        return 1.0 - jnp.exp(-sigma * cfg.step_size)

    if gx * gy * gz <= _DENSE_ALPHA_CHUNK_PTS:
        grid = jnp.stack(jnp.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)
        return eval_pts(grid).reshape(gx, gy, gz)

    gyz = jnp.stack(jnp.meshgrid(ys, zs, indexing="ij"), axis=-1)  # [gy,gz,2]

    def slab(x):
        grid = jnp.concatenate(
            [jnp.broadcast_to(x, (gy, gz))[..., None], gyz], axis=-1
        )
        return eval_pts(grid)

    alphas = jax.lax.map(slab, xs)  # [gx, gy*gz]
    return alphas.reshape(gx, gy, gz)


def update_alpha_volume(params, cfg: TensorfConfig, grid_size) -> jax.Array:
    """Binary occupancy volume: dense alpha -> 3x3x3 maxpool -> threshold
    (ref: models/tensorBase.py:517-536). Returns [gz, gy, gx] float 0/1."""
    alpha = compute_dense_alpha(params, cfg, grid_size)
    alpha = jnp.clip(alpha, 0.0, 1.0).transpose(2, 1, 0)  # -> [z, y, x]
    pooled = jax.lax.reduce_window(
        alpha,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(3, 3, 3),
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
    )
    return (pooled >= cfg.alpha_mask_thres).astype(jnp.float32)
