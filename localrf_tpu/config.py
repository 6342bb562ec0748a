"""CLI / config-file flag surface (ref: opt.py:6-201).

Same ~60 flags, same defaults, same `--config` file support (simple
`key = value` format compatible with the reference's configargparse files),
without the configargparse dependency.
"""
from __future__ import annotations

import argparse
import shlex


def _add_config_file_args(argv: list[str]) -> list[str]:
    """Expand `--config file` into its `key = value` lines (CLI wins)."""
    if "--config" not in argv:
        return argv
    i = argv.index("--config")
    path = argv[i + 1]
    rest = argv[:i] + argv[i + 2 :]
    file_args: list[str] = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "=" in line:
                key, val = (p.strip() for p in line.split("=", 1))
            else:
                parts = line.split(None, 1)
                key, val = parts[0], parts[1] if len(parts) > 1 else ""
            vals = shlex.split(val)
            vals = [v for v in vals if v not in ("[", "]")]
            vals = [v.strip("[],") for v in vals]
            file_args += [f"--{key}"] + vals
    # file args first so explicit CLI flags override them
    return file_args + rest


# Flags that are parsed but deliberately have no runtime effect. Every other
# flag must be consumed somewhere in the package (tests/test_config.py
# enforces this inventory, VERDICT r3 item 4).
INERT_FLAGS: dict[str, str] = {
    "config": "consumed by the parser itself (_add_config_file_args)",
    "device": (
        "reference CLI compatibility (ref: opt.py:197); device placement is"
        " owned by the JAX backend — train.reconstruction warns when set"
    ),
    "model_name": (
        "reference CLI compatibility (ref: opt.py:21); validated by argparse"
        " choices — TensorVMSplit is the only model in the reference too"
    ),
}


def config_parser(cmd: str | list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None, help="config file path")
    parser.add_argument("--logdir", type=str, default="./log")
    parser.add_argument("--datadir", type=str, default="./data/llff/fern")
    parser.add_argument("--progress_refresh_rate", type=int, default=200)
    parser.add_argument("--downsampling", type=float, default=-1)
    parser.add_argument(
        "--model_name", type=str, default="TensorVMSplit", choices=["TensorVMSplit"]
    )
    # loader
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--n_views", type=int, default=16)
    # learning rates
    parser.add_argument("--lr_R_init", type=float, default=5e-3)
    parser.add_argument("--lr_t_init", type=float, default=5e-4)
    parser.add_argument("--lr_i_init", type=float, default=0)
    parser.add_argument("--lr_exposure_init", type=float, default=1e-3)
    parser.add_argument("--lr_init", type=float, default=0.02)
    parser.add_argument("--lr_basis", type=float, default=1e-3)
    parser.add_argument("--lr_decay_target_ratio", type=float, default=0.1)
    parser.add_argument("--lr_upsample_reset", type=int, default=1)
    # scheduling
    parser.add_argument("--N_voxel_init", type=int, default=64**3)
    parser.add_argument("--N_voxel_final", type=int, default=640**3)
    parser.add_argument("--n_iters_per_frame", type=int, default=600)
    parser.add_argument("--n_iters_reg", type=int, default=100)
    parser.add_argument(
        "--upsamp_list", type=int, default=[100, 150, 200, 250, 300], nargs="+"
    )
    parser.add_argument(
        "--update_AlphaMask_list", type=int, default=[100, 200, 300], nargs="+"
    )
    parser.add_argument("--refinement_speedup_factor", type=float, default=1.0)
    # progressive optimization
    parser.add_argument("--n_init_frames", type=int, default=5)
    parser.add_argument("--max_drift", type=float, default=1)
    parser.add_argument("--n_max_frames", type=int, default=100)
    parser.add_argument("--add_frames_every", type=int, default=100)
    parser.add_argument("--n_overlap", type=int, default=30)
    parser.add_argument("--prog_speedup_factor", type=float, default=1.0)
    # losses
    parser.add_argument("--loss_depth_weight_inital", type=float, default=0.1)
    parser.add_argument("--loss_flow_weight_inital", type=float, default=1)
    parser.add_argument("--L1_weight", type=float, default=1e-2)
    parser.add_argument("--TV_weight_density", type=float, default=0.0)
    parser.add_argument("--TV_weight_app", type=float, default=0.0)
    # model
    parser.add_argument("--n_lamb_sigma", type=int, default=[8, 8, 8], nargs="+")
    parser.add_argument("--n_lamb_sh", type=int, default=[24, 24, 24], nargs="+")
    parser.add_argument("--data_dim_color", type=int, default=27)
    parser.add_argument("--rm_weight_mask_thre", type=float, default=0.001)
    parser.add_argument("--alpha_mask_thre", type=float, default=0.0001)
    parser.add_argument("--distance_scale", type=float, default=25)
    parser.add_argument("--density_shift", type=float, default=-5)
    # network decoder
    parser.add_argument("--shadingMode", type=str, default="MLP_Fea_late_view")
    parser.add_argument("--pos_pe", type=int, default=0)
    parser.add_argument("--view_pe", type=int, default=0)
    parser.add_argument("--fea_pe", type=int, default=0)
    parser.add_argument("--featureC", type=int, default=128)
    # ckpt / render
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--render_only", type=int, default=0)
    parser.add_argument("--render_test", type=int, default=1)
    parser.add_argument("--render_path", type=int, default=1)
    parser.add_argument("--render_from_file", type=str, default="")
    parser.add_argument("--skip_saving_video", action="store_true")
    parser.add_argument("--skip_TB_images", action="store_true")
    # rendering
    parser.add_argument("--fea2denseAct", type=str, default="softplus")
    parser.add_argument(
        "--nSamples", type=int, default=int(1e6),
        help="cap on march samples per ray; effective count ="
        " min(nSamples, aabbDiag/stepSize + 1) (ref: tensorBase.py:317-327)",
    )
    parser.add_argument("--step_ratio", type=float, default=0.5)
    # camera
    parser.add_argument("--fov", type=float, default=85.6)
    parser.add_argument("--with_preprocessed_poses", type=int, default=0)
    parser.add_argument("--subsequence", default=[0, -1], type=int, nargs=2)
    parser.add_argument("--frame_step", type=int, default=1)
    parser.add_argument("--test_frame_every", default=10, type=int)
    # logging
    parser.add_argument("--vis_every", type=int, default=10000)
    parser.add_argument("--device", type=str, default="tpu")
    # TPU-native extras
    parser.add_argument(
        "--use_pallas", type=int, default=1,
        help="use fused Pallas kernels on TPU (0 = pure-XLA reference path)",
    )
    parser.add_argument(
        "--seed", type=int, default=20211202,
        help="RNG seed for pixel sampling / init (reference hardcodes"
        " 20211202 at train.py:648; exposed here for variance studies)",
    )
    parser.add_argument(
        "--line_bwd", type=str, default="onehot",
        choices=["gather", "segsum", "onehot"],
        help="backward strategy for line-factor gathers: XLA scatter"
        " emitter, Pallas MXU segment-sum, or pure-XLA one-hot matmul"
        " (default; fastest measured in-step at production shapes, PERF.md)",
    )
    parser.add_argument(
        "--binned_scatter", type=int, default=1,
        help="route plane-table backward scatters through the binned"
        " Pallas kernel (sort + per-tile MXU one-hot matmuls) instead of"
        " XLA's per-index scatter emitter (in-step win at every schedule"
        " stage, PERF.md r4); 0 = XLA emitter everywhere",
    )
    parser.add_argument(
        "--binned_min_rows", type=int, default=2000,
        help="minimum plane-table row count for the binned scatter kernel"
        " (below it the XLA emitter is used; the r4 threshold sweep"
        " measured binned wins down to the 64^3 stage's 4,096-row tables,"
        " so the default only excludes degenerate tables)",
    )
    parser.add_argument(
        "--matmul_precision", type=str, default="default",
        choices=["default", "high", "highest"],
        help="jax_default_matmul_precision: TPU f32 dots run as single-pass"
        " bf16 by default; 'highest' = 3-pass bf16 (~f32) on every dot,"
        " including the one-hot-matmul scatter backwards — the full-"
        "precision parity switch (PARITY_RUN.md)",
    )
    parser.add_argument(
        "--fused_plane_gather", type=int, default=0,
        help="gather the 3 plane tables' rows in ONE dispatch over a"
        " row-concatenated table (one backward scatter). Measured 1.39x"
        " in-step LOSS at 404^3/640^3 (the fused backward's sort/bin prep"
        " serializes on the critical path; three per-orientation kernels"
        " overlap — scripts/ab_combo.py) — default 0 = per-orientation",
    )
    parser.add_argument(
        "--fused_line_gather", type=int, default=0,
        help="gather the 3 line tables' rows in ONE dispatch over a"
        " row-concatenated stack, backward = 3 per-orientation one-hot"
        " matmuls; requires --line_bwd onehot. Measured in-step 1.7% LOSS"
        " at 640^3 (scripts/ab_combo.py) — stays opt-in",
    )
    parser.add_argument(
        "--fused_fwd_gather", type=int, default=0, choices=[0, 1, 2],
        help="forward-fuse the factor-table gathers into ONE dispatch with"
        " per-orientation backwards (1 = the 3 plane tables, 2 = planes +"
        " lane-padded line tables). Measured 1.40x in-step LOSS at"
        " 404^3/640^3: the concatenated table crosses XLA's gather"
        " table-size cliff (~3.5 -> ~12.3 ns/idx above ~128 MB — PERF.md"
        " round 4), which also re-attributes the r3 fused_plane_gather"
        " loss. Stays opt-in; useful only below the cliff",
    )
    parser.add_argument(
        "--fused_march", type=int, default=0,
        help="fuse the march core (plane-row lerp + VMEM-resident line"
        " lookup + factor product + basis matmul + shading MLP) into one"
        " Pallas kernel with analytic VJP (ops/pallas/march.py); plane"
        " gathers/scatters stay on the XLA/binned path. Only active for the"
        " reference's default shape config. Measured in-step LOSS at every"
        " stage (1.22-1.44x, PERF.md round 4): the decomposed path's"
        " intermediates already fuse and XLA overlaps the per-orientation"
        " gathers the kernel barriers on — stays opt-in",
    )
    parser.add_argument(
        "--data_parallel", type=int, default=0,
        help="shard the ray batch over this many devices (0 = all available)",
    )
    parser.add_argument(
        "--resume", type=int, default=0,
        help="resume mid-training from logdir/checkpoints_tmp.th if present"
        " (true resume incl. optimizer state — the reference only supports"
        " re-rendering from a tmp checkpoint)",
    )
    parser.add_argument(
        "--app_top_k", type=int, default=128,
        help="shade appearance only at the top-K samples per ray by"
        " compositing weight (static-shape analog of the reference's"
        " weight>thres masking; 0 = dense). Only applies to the oracle"
        " grid-sample path; the default fused-gather path shades densely",
    )
    parser.add_argument(
        "--gather_dtype", type=str, default="bfloat16",
        choices=["float32", "bfloat16"],
        help="dtype of the derived factor-grid gather tables (canonical"
        " params stay float32). bfloat16 nearly halves the dominant"
        " gather/scatter HBM traffic; interpolation weights are also"
        " rounded to bf16, quantizing sub-voxel positions to ~1/256 of a"
        " texel (convergence-tested; see tests/test_golden_trajectory.py)",
    )
    parser.add_argument(
        "--mlp_dtype", type=str, default="bfloat16",
        choices=["float32", "bfloat16"],
        help="compute dtype of the shading MLP + basis matmul (master"
        " weights stay float32); bfloat16 uses the fast MXU path",
    )
    parser.add_argument(
        "--moment_dtype", type=str, default="float32",
        choices=["float32", "bfloat16"],
        help="storage dtype of the field optimizer's Adam moments (update"
        " math stays float32); bfloat16 halves optimizer HBM per field",
    )
    parser.add_argument(
        "--occ_ratio", type=float, default=0.45,
        help="occupancy compaction: fraction of march samples kept once an"
        " alpha volume exists (exact while < that many samples are occupied)",
    )
    parser.add_argument(
        "--occ_min", type=int, default=256,
        help="occupancy compaction floor (samples per ray)",
    )
    parser.add_argument(
        "--occ_probe_ds", type=int, default=4,
        help="coarse march probe: probe the ds-pooled+dilated alpha volume"
        " once per group of ds march samples instead of per sample"
        " (R*S/ds occupancy gathers + ds-x smaller compaction top_k);"
        " 0 = exact per-sample cull. Default 4: measured win at every"
        " stage (scripts/ab_combo.py) + bit-exact parity-scene quality gate",
    )
    parser.add_argument(
        "--occ_refine", type=int, default=1,
        help="with --occ_probe_ds: still apply the exact fine-volume cull at"
        " the selected samples (identical density-carrying sample set to the"
        " exact path whenever no occupied group is truncated)",
    )
    parser.add_argument(
        "--pixel_pool", type=int, default=1,
        help="keep the active window's pixel data device-resident and gather"
        " training batches on device (host ships only sample indices)."
        " Default 1 since r5: every driver-level benchmark (bench_driver,"
        " PERF.md host-overhead table) measures this path; 0 restores the"
        " host-shipped batch values (~3.5 MB/step at batch 4096)",
    )
    parser.add_argument(
        "--scan_chunk", type=int, default=16,
        help="fuse this many train steps into one on-device lax.scan dispatch"
        " (1 = step-at-a-time, bit-exact reference scheduling)",
    )

    if cmd is not None:
        argv = shlex.split(cmd) if isinstance(cmd, str) else list(cmd)
    else:
        import sys

        argv = sys.argv[1:]
    argv = _add_config_file_args(argv)
    return parser.parse_args(argv)
