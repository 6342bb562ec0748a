"""LocalTensorfs: host-side progressive manager over jitted device steps.

TPU re-design of the reference's `LocalTensorfs(torch.nn.Module)`
(ref: local_tensorfs.py:31-498). All trainable state lives in device pytrees
(a sliding pose window + the active field); the manager is a pure-host state
machine that:

  * appends frames / local fields (ref: local_tensorfs.py:116-177) by writing
    into stacked arrays — no module mutation, no retraces between events;
  * drives the jitted `train_step` with dynamic scalars (lr factor, refine /
    regularize flags, gates) so phase flips never recompile;
  * applies coarse-to-fine upsampling + alpha-mask refresh between steps
    (ref: local_tensorfs.py:250-266) — one compile bucket per grid stage,
    cached across all local fields;
  * keeps retired fields as host (CPU) pytrees, mirroring the reference's
    CPU offload (ref: local_tensorfs.py:132), and blends them at eval.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import mtx_to_sixD, n_to_reso, sixD_to_mtx
from ..optim import AdamState, PyTreeAdamState, adam_init, pytree_adam_init
from .step import (
    FieldState,
    IntrState,
    PoseState,
    StepStatics,
    cam2world_from_params,
    render_chunk,
    render_frame,
    train_chunk,
    train_step,
    train_step_poses_only,
)
from .tensorf import TensorfConfig, init_tensorf, update_alpha_volume, upsample_tensorf


@dataclasses.dataclass
class LocalConfig:
    """Configuration for the progressive multi-field model (mirrors the
    reference's LocalTensorfs kwargs, ref: local_tensorfs.py:36-57)."""

    fov: float = 85.6
    n_init_frames: int = 5
    n_overlap: int = 30
    WH: tuple[int, int] = (960, 540)
    n_iters_per_frame: int = 600
    n_iters_reg: int = 100
    lr_R_init: float = 5e-3
    lr_t_init: float = 5e-4
    lr_i_init: float = 0.0
    lr_exposure_init: float = 1e-3
    rf_lr_init: float = 0.02
    rf_lr_basis: float = 1e-3
    lr_decay_target_ratio: float = 0.1
    N_voxel_list: dict[int, int] = dataclasses.field(default_factory=dict)
    update_AlphaMask_list: list[int] = dataclasses.field(default_factory=list)
    lr_upsample_reset: bool = True
    # loss config
    loss_flow_weight: float = 1.0
    loss_depth_weight: float = 0.1
    tv_weight_density: float = 0.0
    tv_weight_app: float = 0.0
    l1_weight: float = 1e-2
    # batch shape
    n_views: int = 16
    batch_size: int = 4096
    # occupancy compaction tuning (see _occ_m): fraction of samples kept and
    # its floor; compaction engages only when it removes > half the samples
    occ_ratio: float = 0.45
    occ_min: int = 256
    # storage dtype of the field optimizer's Adam moments (update math stays
    # float32); "bfloat16" halves optimizer HBM per field
    moment_dtype: str = "float32"
    # field template (grid_size = initial resolution for every new field)
    tensorf: TensorfConfig = dataclasses.field(
        default_factory=lambda: TensorfConfig(grid_size=(64, 64, 64))
    )
    seed: int = 20211202

    @property
    def px_per_view(self) -> int:
        return self.batch_size // self.n_views


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class LocalTensorfs:
    def __init__(self, cfg: LocalConfig, camera_prior: dict | None = None):
        self.cfg = cfg
        self.camera_prior = camera_prior
        self.W, self.H = cfg.WH
        self._key = jax.random.PRNGKey(cfg.seed)

        # --- per-frame host state (full history) ---
        self.r_all = np.zeros((0, 3, 2), np.float32)
        self.t_all = np.zeros((0, 3), np.float32)
        self.exp_all = np.zeros((0, 3, 3), np.float32)
        self.pose_opt_all: dict[str, np.ndarray] = {}  # moments/step/lr, [N,...]
        self.pose_linked_rf: list[int] = []
        self.blending_weights = np.ones((0, 1), np.float32)

        # --- per-field state ---
        self.fields: list[dict[str, Any]] = []  # params/cfg/alpha/opt (host or dev)
        self.world2rf: list[np.ndarray] = []
        self.rf_iter: list[int] = []

        # --- schedule state (ref: local_tensorfs.py:74-83) ---
        self.is_refining = False
        self.lr_factor = 1.0
        self.n_iters = cfg.n_iters_per_frame
        self.n_iters_reg = cfg.n_iters_reg
        self.N_voxel_list = dict(cfg.N_voxel_list)
        self.update_AlphaMask_list = list(cfg.update_AlphaMask_list)

        # --- intrinsics ---
        if camera_prior is not None:
            focal = camera_prior["transforms"]["fl_x"]
            focal *= self.W / camera_prior["transforms"]["w"]
        else:
            fov_rad = cfg.fov * math.pi / 180
            focal = self.W / math.tan(fov_rad / 2) / 2
        self.init_focal = float(focal)
        intr_params = {
            "focal_offset": jnp.ones(()),
            "center_rel": 0.5 * jnp.ones((2,)),
        }
        self.intr = IntrState(intr_params, pytree_adam_init(intr_params))

        # --- device pose window ---
        self.win_start = 0
        self._wc = 64  # capacity; grows in steps of 32
        self._pose_dev: PoseState | None = None

        # --- optional ray-batch data parallelism ---
        self.mesh = None
        self._mesh_states_placed = False

        # --- optional device-resident pixel pool ---
        self.pool = None

        for _ in range(cfg.n_init_frames):
            self.append_frame()

        self.append_rf()

    # ------------------------------------------------------------------
    # window plumbing
    # ------------------------------------------------------------------

    @property
    def n_frames(self) -> int:
        return self.r_all.shape[0]

    @property
    def win_len(self) -> int:
        return self.n_frames - self.win_start

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _init_pose_opt_rows(self, n: int) -> dict[str, np.ndarray]:
        c = self.cfg
        return {
            "r_m": np.zeros((n, 3, 2), np.float32),
            "r_v": np.zeros((n, 3, 2), np.float32),
            "r_step": np.zeros((n,), np.int32),
            "r_lr": np.full((n,), c.lr_R_init, np.float32),
            "t_m": np.zeros((n, 3), np.float32),
            "t_v": np.zeros((n, 3), np.float32),
            "t_step": np.zeros((n,), np.int32),
            "t_lr": np.full((n,), c.lr_t_init, np.float32),
            "e_m": np.zeros((n, 3, 3), np.float32),
            "e_v": np.zeros((n, 3, 3), np.float32),
            "e_step": np.zeros((n,), np.int32),
            "e_lr": np.full((n,), c.lr_exposure_init, np.float32),
        }

    def sync_window_to_host(self):
        """Pull the device pose window back into the full host arrays."""
        if self._pose_dev is None:
            return
        s, l = self.win_start, self.win_len
        p = jax.device_get(self._pose_dev)
        self.r_all[s : s + l] = p.r[:l]
        self.t_all[s : s + l] = p.t[:l]
        self.exp_all[s : s + l] = p.exposure[:l]
        o = self.pose_opt_all
        for name, st in (("r", p.r_opt), ("t", p.t_opt), ("e", p.e_opt)):
            o[f"{name}_m"][s : s + l] = st.m[:l]
            o[f"{name}_v"][s : s + l] = st.v[:l]
            o[f"{name}_step"][s : s + l] = st.step[:l]
            o[f"{name}_lr"][s : s + l] = st.lr[:l]

    def _build_window(self):
        """(Re)build the device pose window [win_start, n_frames) padded to
        capacity."""
        s, l = self.win_start, self.win_len
        while l > self._wc:
            self._wc += 32
        wc = self._wc

        def pad(a: np.ndarray) -> np.ndarray:
            out = np.zeros((wc,) + a.shape[1:], a.dtype)
            out[:l] = a[s : s + l]
            if a.ndim == 3 and a.shape[1:] == (3, 3):
                out[l:] = np.eye(3, dtype=a.dtype)  # keep padding exposures sane
            return out

        o = self.pose_opt_all

        def adam(name) -> AdamState:
            return AdamState(
                jnp.asarray(pad(o[f"{name}_m"])),
                jnp.asarray(pad(o[f"{name}_v"])),
                jnp.asarray(pad(o[f"{name}_step"])),
                jnp.asarray(pad(o[f"{name}_lr"])),
            )

        self._mesh_states_placed = False  # fresh arrays need re-placing
        self._pose_dev = PoseState(
            r=jnp.asarray(pad(self.r_all)),
            t=jnp.asarray(pad(self.t_all)),
            exposure=jnp.asarray(pad(self.exp_all)),
            r_opt=adam("r"),
            t_opt=adam("t"),
            e_opt=adam("e"),
        )

    def set_window_start(self, start: int):
        """Slide the window after frames are deactivated. The window keeps one
        frame before the first active frame for bwd-flow supervision
        (ref: train.py:388)."""
        start = max(start - 1, 0)
        if start != self.win_start:
            self.sync_window_to_host()
            self.win_start = start
            self._build_window()

    def _gate(self) -> np.ndarray:
        """Per-window-frame bool: pose/exposure updates only for frames linked
        to the current field while it still trains
        (ref: local_tensorfs.py:210-211)."""
        cur = len(self.rf_iter) - 1
        gate = np.zeros((self._wc,), bool)
        if self.rf_iter[-1] < self.n_iters:
            for i in range(self.win_len):
                if self.pose_linked_rf[self.win_start + i] == cur:
                    gate[i] = True
        return gate

    # ------------------------------------------------------------------
    # progressive growth (ref: local_tensorfs.py:116-177)
    # ------------------------------------------------------------------

    def append_frame(self):
        self.sync_window_to_host()
        if self.n_frames == 0:
            r = np.eye(3, dtype=np.float32)[:, :2][None]
            t = np.zeros((1, 3), np.float32)
            self.pose_linked_rf.append(0)
            self.blending_weights = np.ones((1, 1), np.float32)
        else:
            r_last = np.asarray(
                mtx_to_sixD(sixD_to_mtx(jnp.asarray(self.r_all[-1:])))
            )
            r = r_last
            t = self.t_all[-1:].copy()
            self.blending_weights = np.concatenate(
                [self.blending_weights, self.blending_weights[-1:, :]], axis=0
            )
            # threshold, not exact nonzero: the cross-fade ladder is computed
            # in float and "1 - w" can leave a ~1e-16 residue in the retired
            # column (torch f32 rounds it to 0, so the reference's exact
            # nonzero is safe; numpy f64 is not). A residue here linked every
            # post-spawn frame to RF 0, and _gate() then froze ALL pose
            # optimization after the first spawn (found by the full-scale
            # parity A/B: 10x pose RMSE). Ref: local_tensorfs.py:163.
            w_row = self.blending_weights[-1, :]
            rf_ind = int(np.nonzero(w_row > 1e-6)[0][0])
            self.pose_linked_rf.append(rf_ind)

        exp = np.eye(3, dtype=np.float32)[None]

        if self.camera_prior is not None:
            idx = self.n_frames
            rel_pose = np.asarray(self.camera_prior["rel_poses"][idx], np.float32)
            last_r = np.asarray(sixD_to_mtx(jnp.asarray(r)))[0]
            r = np.asarray(
                mtx_to_sixD(jnp.asarray((last_r @ rel_pose[:3, :3])[None]))
            )
            t = t + (last_r @ rel_pose[:3, 3])[None]

        self.r_all = np.concatenate([self.r_all, r], axis=0)
        self.t_all = np.concatenate([self.t_all, t], axis=0)
        self.exp_all = np.concatenate([self.exp_all, exp], axis=0)
        rows = self._init_pose_opt_rows(1)
        if not self.pose_opt_all:
            self.pose_opt_all = rows
        else:
            for k in rows:
                self.pose_opt_all[k] = np.concatenate(
                    [self.pose_opt_all[k], rows[k]], axis=0
                )
        self._build_window()

    def append_rf(self, n_added_frames: int = 1):
        self.sync_window_to_host()
        self.is_refining = False
        if len(self.fields) > 0:
            n_overlap = min(
                n_added_frames, self.cfg.n_overlap, self.blending_weights.shape[0] - 1
            )
            # k/n directly (not 1/n + arange steps): the last weight is then
            # exactly 1.0 and the retired column's "1 - w" exactly 0.0 for
            # every n_overlap, incl. non-powers-of-two like the default 6
            # (ref: local_tensorfs.py:121 computes the same ladder in f32,
            # where rounding happens to land on 1.0)
            weights_overlap = (
                np.arange(1, n_overlap + 1, dtype=np.float64) / n_overlap
            )
            self.blending_weights[-n_overlap:, -1] = 1 - weights_overlap
            new_col = np.zeros_like(self.blending_weights[:, 0:1])
            new_col[-n_overlap:, 0] = weights_overlap
            self.blending_weights = np.concatenate(
                [self.blending_weights, new_col], axis=1
            )
            world2rf = -self.t_all[-1].copy()
            # offload the previous field to host memory
            prev = self.fields[-1]
            prev["params"] = jax.device_get(prev["params"])
            prev["opt"] = None
        else:
            world2rf = np.zeros(3, np.float32)

        tf_cfg = self.cfg.tensorf
        params = init_tensorf(self._next_key(), tf_cfg)
        self.fields.append(
            {
                "params": params,
                "cfg": tf_cfg,
                "alpha_volume": None,
                "opt": pytree_adam_init(params, self.cfg.moment_dtype),
            }
        )
        self.world2rf.append(np.asarray(world2rf, np.float32))
        self.rf_iter.append(0)

    # ------------------------------------------------------------------
    # optimization (ref: local_tensorfs.py:179-290)
    # ------------------------------------------------------------------

    def _statics(self, optimize_poses: bool) -> StepStatics:
        c = self.cfg
        f = self.fields[-1]
        return StepStatics(
            cfg=f["cfg"],
            w=self.W,
            h=self.H,
            n_views=c.n_views,
            px_per_view=c.px_per_view,
            wc=self._wc,
            fov360=(c.fov == 360),
            white_bg=True,
            optimize_poses=optimize_poses,
            exposure_on=c.lr_exposure_init > 0,
            intrinsics_on=c.lr_i_init > 0,
            flow_on=c.loss_flow_weight > 0 and c.fov != 360,
            depth_on=c.loss_depth_weight > 0 and c.fov != 360,
            has_alpha=f["alpha_volume"] is not None,
            flow_weight=c.loss_flow_weight,
            depth_weight=c.loss_depth_weight,
            lr_spatial=c.rf_lr_init,
            lr_net=c.rf_lr_basis,
        )

    def _scalars_py(self, pose_only: bool = False) -> dict[str, Any]:
        c = self.cfg
        it = self.rf_iter[-1]
        regularize = it < self.n_iters_reg
        reg_w = self.lr_factor**it
        reg_on = regularize and it < self.n_iters
        return {
            "init_focal": np.float32(self.init_focal),
            "w_scale": np.float32(1.0),
            "world2rf": np.asarray(self.world2rf[-1], np.float32),
            "n_valid": np.int32(self.win_len),
            "lr_factor": np.float32(self.lr_factor),
            "reg_w": np.float32(reg_w),
            "reg_flag": np.float32(1.0 if regularize else 0.0),
            "refine": np.float32(1.0 if self.is_refining else 0.0),
            "is_refining": np.float32(1.0 if self.is_refining else 0.0),
            "is_first_rf": np.float32(
                1.0 if self.blending_weights.shape[1] == 1 else 0.0
            ),
            "tv_wd": np.float32(c.tv_weight_density * reg_w if reg_on else 0.0),
            "tv_wa": np.float32(c.tv_weight_app * reg_w if reg_on else 0.0),
            "l1_w": np.float32(c.l1_weight if reg_on else 0.0),
            "lr_i_base": np.float32(c.lr_i_init),
            "pose_only": np.float32(1.0 if pose_only else 0.0),
        }

    def _scalars(self) -> dict[str, Any]:
        return {k: jnp.asarray(v) for k, v in self._scalars_py().items()}

    def _host_batch(self, batch: dict) -> dict:
        """Host batch -> numpy arrays with window-relative view ids."""
        view_rel = np.asarray(batch["view_ids"], np.int64) - self.win_start
        out = {
            "ray_idx": np.asarray(batch["idx"], np.int32),
            "view_ids": view_rel.astype(np.int32),
            "rgbs": np.asarray(batch["rgbs"], np.float32),
            "loss_weights": np.asarray(batch["loss_weights"], np.float32).reshape(-1, 1),
        }
        for k in ("fwd_flow", "bwd_flow"):
            if batch.get(k) is not None:
                out[k] = np.asarray(batch[k], np.float32)
        for k in ("fwd_mask", "bwd_mask", "invdepths"):
            if batch.get(k) is not None:
                out[k] = np.asarray(batch[k], np.float32).reshape(-1)
        return out

    def _device_batch(self, batch: dict) -> dict:
        out = {k: jnp.asarray(v) for k, v in self._host_batch(batch).items()}
        out["gate"] = jnp.asarray(self._gate())
        return out

    def _schedule_entry(self):
        """Per-step schedule bookkeeping at step entry
        (ref: local_tensorfs.py:194-206)."""
        c = self.cfg
        if self.rf_iter[-1] == 0:
            self.lr_factor = 1.0
            self.n_iters = c.n_iters_per_frame
            self.n_iters_reg = c.n_iters_reg
        elif self.rf_iter[-1] == 1:
            n_training_frames = int((self.blending_weights[:, -1] > 0).sum())
            self.n_iters = int(c.n_iters_per_frame * n_training_frames)
            self.n_iters_reg = int(c.n_iters_reg * n_training_frames)
            self.lr_factor = c.lr_decay_target_ratio ** (1 / self.n_iters)
            self.N_voxel_list = {
                int(k * n_training_frames): v for k, v in c.N_voxel_list.items()
            }
            self.update_AlphaMask_list = [
                int(u * n_training_frames) for u in c.update_AlphaMask_list
            ]

    def _occ_m(self, tf_cfg: TensorfConfig, has_alpha: bool) -> int:
        """Static compacted sample count for occupancy culling: keep ~45% of
        samples (floor 256) once an alpha volume exists; disabled when that
        wouldn't shrink the march."""
        if not has_alpha:
            return 0
        s = tf_cfg.n_samples // 6 * 2
        m = min(s, max(self.cfg.occ_min, int(s * self.cfg.occ_ratio)))
        # compaction pays for any m < s: its only overhead beyond the dense
        # cull (which also gathers the packed occupancy byte per sample) is
        # one [R,S] top_k plus two tiny-table z/dist takes, while the
        # savings scale every per-point gather/scatter/MLP cost by m/s.
        # (An earlier >50%-removal guard predates the selected-point
        # recompute — it left the 255^3/404^3 stages fully dense, measured
        # 2x slower than compacted at 404^3.) Above ~85% kept the fixed
        # cost outweighs the trim (255^3: m/s=0.88 measured 4% slower
        # compacted).
        return 0 if m > 0.85 * s else int(m)

    def _apply_post_step_events(self):
        """Upsample / occupancy refresh keyed on the pre-increment rf_iter
        (ref: local_tensorfs.py:250-266)."""
        c = self.cfg
        f = self.fields[-1]
        if self.rf_iter[-1] in self.N_voxel_list:
            n_vox = self.N_voxel_list[self.rf_iter[-1]]
            reso = n_to_reso(n_vox, f["cfg"].aabb)
            f["params"], f["cfg"] = upsample_tensorf(f["params"], f["cfg"], reso)
            if c.lr_upsample_reset:
                f["opt"] = pytree_adam_init(f["params"], c.moment_dtype)
            else:
                f["opt"] = pytree_adam_init(f["params"], c.moment_dtype)._replace(
                    lr_scale=f["opt"].lr_scale
                )
        if self.rf_iter[-1] in self.update_AlphaMask_list:
            reso_mask = tuple(int(g / 2) for g in f["cfg"].grid_size)
            f["alpha_volume"] = update_alpha_volume(f["params"], f["cfg"], reso_mask)
        f["cfg"] = dataclasses.replace(
            f["cfg"], occ_m=self._occ_m(f["cfg"], f["alpha_volume"] is not None)
        )

    def _has_post_step_event(self, rf_iter: int) -> bool:
        return rf_iter in self.N_voxel_list or rf_iter in self.update_AlphaMask_list

    def optimizer_step(self, batch: dict, optimize_poses: bool) -> bool:
        """One joint step; returns can_add_rf (ref: local_tensorfs.py:193-290)."""
        self._schedule_entry()
        f = self.fields[-1]
        statics = self._statics(optimize_poses)
        field_state = FieldState(f["params"], f["opt"])
        new_field, new_pose, new_intr, metrics = train_step(
            field_state,
            self._pose_dev,
            self.intr,
            self._device_batch(batch),
            self._scalars(),
            statics,
            self._next_key(),
            f["alpha_volume"],
        )
        f["params"], f["opt"] = new_field.params, new_field.opt
        self._pose_dev = new_pose
        self.intr = new_intr
        self.last_metrics = {k: float(v) for k, v in metrics.items()}

        self._apply_post_step_events()

        if self.is_refining:
            self.rf_iter[-1] += 1

        return self.rf_iter[-1] >= self.n_iters - 1

    def optimizer_step_poses_only(self, batch: dict):
        """Test-pose photometric refinement (ref: local_tensorfs.py:179-191)."""
        f = self.fields[-1]
        statics = self._statics(optimize_poses=True)
        field_state = FieldState(f["params"], f["opt"])
        _, new_pose, _, metrics = train_step_poses_only(
            field_state,
            self._pose_dev,
            self.intr,
            self._device_batch(batch),
            self._scalars(),
            statics,
            self._next_key(),
            f["alpha_volume"],
        )
        self._pose_dev = new_pose
        self.last_metrics = {k: float(v) for k, v in metrics.items()}

    # ------------------------------------------------------------------
    # fused chunk execution: K steps in one on-device scan
    # ------------------------------------------------------------------

    def plan_chunk(self, dataset, optimize_poses: bool, max_len: int) -> list[dict]:
        """Sample up to max_len batches such that no schedule event (upsample,
        occupancy refresh, can_add_rf) falls strictly inside the chunk. The
        host schedule is simulated exactly — the same simulation replays
        during run_chunk."""
        c = self.cfg
        batches = []
        sim_rf_iter = self.rf_iter[-1]
        sim_n_iters = self.n_iters
        # replicate the entry branch the first joint step would run
        if sim_rf_iter == 0:
            sim_n_iters = c.n_iters_per_frame
        elif sim_rf_iter == 1:
            n_tf = int((self.blending_weights[:, -1] > 0).sum())
            sim_n_iters = int(c.n_iters_per_frame * n_tf)
        while len(batches) < max_len:
            batch = dataset.sample(
                c.batch_size, self.is_refining, optimize_poses,
                n_views=c.n_views, values=self.pool is None,
            )
            batches.append(batch)
            if batch["train_test_poses"]:
                continue
            if self._has_post_step_event(sim_rf_iter):
                break  # device-side event right after this step
            if self.is_refining:
                sim_rf_iter += 1
            if sim_rf_iter >= sim_n_iters - 1:
                break  # can_add_rf
            if sim_rf_iter == 1:
                break  # schedule rescale changes lists; re-plan
        return batches

    def set_mesh(self, mesh) -> None:
        """Enable ray-batch data parallelism over `mesh` (axis "data"):
        batches are sharded along the view-major ray axis, parameters and
        optimizer state replicated; GSPMD inserts the gradient psum inside
        the jitted step (see parallel/sharding.py)."""
        self.mesh = mesh
        self._mesh_states_placed = False

    def _mesh_shardings(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharding import DATA_AXIS

        return (
            NamedSharding(self.mesh, P(None, DATA_AXIS)),  # [K, rays, ...]
            NamedSharding(self.mesh, P()),  # replicated
        )

    def _ensure_mesh_states(self, repl) -> None:
        """Replicate model/optimizer state over the mesh (once, and again
        after schedule events rebuild arrays)."""
        if self._mesh_states_placed:
            return
        place = lambda t: jax.tree.map(lambda x: jax.device_put(x, repl), t)
        f = self.fields[-1]
        f["params"] = place(f["params"])
        f["opt"] = place(f["opt"])
        if f["alpha_volume"] is not None:
            f["alpha_volume"] = jax.device_put(f["alpha_volume"], repl)
        self._pose_dev = place(self._pose_dev)
        self.intr = place(self.intr)
        if self.pool is not None:
            self.pool.arrays = place(self.pool.arrays)
        self._mesh_states_placed = True

    def _place_stacked(self, stacked: dict, sharded_keys) -> dict:
        """Place [K, ...]-stacked host arrays on the mesh: keys whose axis 1
        is the ray/view axis shard over it, the rest replicate."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in stacked.items()}
        data, repl = self._mesh_shardings()
        out = {}
        for k, v in stacked.items():
            v = np.asarray(v)
            if k in sharded_keys and v.shape[1] % self.mesh.size == 0:
                out[k] = jax.device_put(v, data)
            else:
                out[k] = jax.device_put(v, repl)
        self._ensure_mesh_states(repl)
        return out

    def _place_batch(self, stacked: dict) -> dict:
        from ..parallel.sharding import _SHARDED_KEYS

        return self._place_stacked(stacked, _SHARDED_KEYS)

    # index-stream keys of the pooled path whose axis 1 is the ray/view axis
    _POOL_SHARDED_KEYS = ("px", "slots", "view_ids")

    def _place_pool_batch(self, stacked: dict) -> dict:
        return self._place_stacked(stacked, self._POOL_SHARDED_KEYS)

    def attach_pool(self, pool) -> None:
        """Use a DevicePixelPool: batches become int32 index streams and the
        pixel values are gathered on device inside the fused chunk. Composes
        with ray-batch data parallelism: pool arrays are replicated over the
        mesh (a few hundred MB max) and the index stream is sharded, so the
        on-device gather lands sharded and GSPMD proceeds as in the
        unpooled path."""
        self.pool = pool
        if self.mesh is not None:
            self._mesh_states_placed = False

    def run_chunk(self, batches: list[dict], optimize_poses: bool) -> bool:
        """Execute pre-planned batches as one fused lax.scan dispatch.

        Mirrors a sequence of optimizer_step / optimizer_step_poses_only
        calls (ref: train.py:432-437) with identical schedule bookkeeping;
        returns can_add_rf after the last step."""
        if not batches:
            return False
        k = len(batches)
        scal_seq: list[dict] = []
        host_batches: list[dict] = []
        rf_iter_pre_last = self.rf_iter[-1]
        use_pool = self.pool is not None
        if use_pool:
            self.pool.sync()

        for b in batches:
            pose_only = bool(b["train_test_poses"])
            if not pose_only:
                self._schedule_entry()
                rf_iter_pre_last = self.rf_iter[-1]
            scal_seq.append(self._scalars_py(pose_only))
            if use_pool:
                hb = {
                    "px": np.asarray(
                        np.asarray(b["idx"]) % self.pool.n_px, np.int32
                    ),
                    "slots": self.pool.slots_for(b["view_ids"]),
                    "view_ids": (
                        np.asarray(b["view_ids"], np.int64) - self.win_start
                    ).astype(np.int32),
                }
            else:
                hb = self._host_batch(b)
            hb["gate"] = self._gate()
            host_batches.append(hb)
            if not pose_only and self.is_refining:
                self.rf_iter[-1] += 1

        stacked_batch = {
            key: np.stack([hb[key] for hb in host_batches])
            for key in host_batches[0]
        }
        stacked_scal = {
            key: jnp.asarray(np.stack([sc[key] for sc in scal_seq]))
            for key in scal_seq[0]
        }
        # same key stream as k sequential optimizer_step calls -> chunked
        # execution is bit-identical to step-at-a-time execution
        keys = jnp.stack([self._next_key() for _ in range(k)])

        f = self.fields[-1]
        statics = self._statics(optimize_poses)
        field_state = FieldState(f["params"], f["opt"])
        if use_pool:
            from .step import train_chunk_pooled

            stacked_batch = self._place_pool_batch(stacked_batch)
            chunk_args = (
                field_state,
                self._pose_dev,
                self.intr,
                self.pool.arrays,
                stacked_batch,
                stacked_scal,
                statics,
                keys,
                k,
                self.pool.n_px,
                f["alpha_volume"],
            )
            if getattr(self, "debug_record_placement", False):
                # sharding regression hooks for the multichip dryrun
                # (__graft_entry__): the placed batch + the exact jitted-call
                # args, so the dryrun can assert array shardings and lower
                # the executable to check GSPMD inserted collectives
                self.last_placed_batch = stacked_batch
                self.last_chunk_args = chunk_args
            new_field, new_pose, new_intr, metrics = train_chunk_pooled(
                *chunk_args
            )
        else:
            stacked_batch = self._place_batch(stacked_batch)
            new_field, new_pose, new_intr, metrics = train_chunk(
                field_state,
                self._pose_dev,
                self.intr,
                stacked_batch,
                stacked_scal,
                statics,
                keys,
                k,
                f["alpha_volume"],
            )
        f["params"], f["opt"] = new_field.params, new_field.opt
        self._pose_dev = new_pose
        self.intr = new_intr
        metrics = jax.device_get(metrics)
        self.last_metrics = {key: float(v[-1]) for key, v in metrics.items()}
        self.chunk_metrics = {key: np.asarray(v) for key, v in metrics.items()}

        # device-side events keyed on the last joint step's pre-increment iter
        rf_iter_saved = self.rf_iter[-1]
        self.rf_iter[-1] = rf_iter_pre_last
        had_event = self._has_post_step_event(rf_iter_pre_last)
        self._apply_post_step_events()
        self.rf_iter[-1] = rf_iter_saved
        if had_event and self.mesh is not None:
            self._mesh_states_placed = False  # re-place freshly created arrays

        return self.rf_iter[-1] >= self.n_iters - 1

    # ------------------------------------------------------------------
    # queries
    # ------------------------------------------------------------------

    def get_cam2world(self, view_ids=None, starting_id: int = 0) -> np.ndarray:
        self.sync_window_to_host()
        r = jnp.asarray(self.r_all)
        t = jnp.asarray(self.t_all)
        c2w = np.asarray(cam2world_from_params(r, t))
        if view_ids is not None:
            return c2w[np.asarray(view_ids)]
        return c2w[starting_id:]

    def get_dist_to_last_rf(self) -> float:
        t_last = np.asarray(jax.device_get(self._pose_dev.t[self.win_len - 1]))
        return float(np.linalg.norm(t_last + self.world2rf[-1]))

    def focal(self, w: int) -> float:
        off = float(jax.device_get(self.intr.params["focal_offset"]))
        return self.init_focal * off * w / self.W

    def center(self, w: int, h: int) -> np.ndarray:
        rel = np.asarray(jax.device_get(self.intr.params["center_rel"]))
        return np.array([w, h], np.float32) * rel

    # ------------------------------------------------------------------
    # evaluation forward: blend all fields with nonzero weight
    # (ref: local_tensorfs.py:382-498, is_train=False branch)
    # ------------------------------------------------------------------

    def _eval_params(self, f: dict):
        """Device copy of a field's params, cached across eval calls.

        Retired fields live on host (append_rf offloads them); without this
        cache a multi-frame path render re-uploads the full factor grids for
        every frame x field. Cache key is the identity of the host pytree, so
        training (which rebinds f["params"]) invalidates automatically.
        """
        cached = f.get("_dev_cache")
        if (
            cached is not None
            and cached[0] is f["params"]
            and cached[2] is self.mesh
        ):
            return cached[1]
        if self.mesh is not None:
            _, repl = self._mesh_shardings()
            params = jax.tree.map(
                lambda x: jax.device_put(x, repl), f["params"]
            )
        else:
            params = jax.tree.map(jnp.asarray, f["params"])
        f["_dev_cache"] = (f["params"], params, self.mesh)
        return params

    def _eval_alpha(self, f: dict):
        """Field alpha volume placed for eval (replicated over the mesh).

        A jit-produced volume is committed to its device; mixing it with
        mesh-sharded ray ids would raise an incompatible-devices error, so
        replicate it once per (volume, mesh) and cache like _eval_params."""
        av = f.get("alpha_volume")
        if av is None or self.mesh is None:
            return av
        cached = f.get("_alpha_cache")
        if cached is not None and cached[0] is av and cached[2] is self.mesh:
            return cached[1]
        _, repl = self._mesh_shardings()
        placed = jax.device_put(av, repl)
        f["_alpha_cache"] = (av, placed, self.mesh)
        return placed

    def _eval_ray_sharding(self, chunk: int, lead_axis: bool):
        """Sharding for eval ray-id arrays over the data mesh, or None.

        Eval is embarrassingly parallel over rays (per-ray march, replicated
        tables), so the same mesh that shards training batches shards frame
        renders: [n_chunks, chunk] (fast path) along the chunk axis,
        [chunk] (generic path) along axis 0."""
        if self.mesh is None or chunk % self.mesh.size != 0:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharding import DATA_AXIS

        spec = P(None, DATA_AXIS) if lead_axis else P(DATA_AXIS)
        return NamedSharding(self.mesh, spec)

    def clear_eval_cache(self):
        """Drop the per-field device copies made by _eval_params.

        Call after a render session: the cache holds a full copy of every
        evaluated field's factor grids in HBM, which scales linearly with
        field count if left to accumulate (renderer.render clears it)."""
        for f in self.fields:
            f.pop("_dev_cache", None)
            f.pop("_alpha_cache", None)

    def forward_eval(
        self,
        ray_ids: np.ndarray,
        view_ids: np.ndarray,
        w: int,
        h: int,
        cam2world: np.ndarray | None = None,
        world2rf: list[np.ndarray] | None = None,
        blending_weights: np.ndarray | None = None,
        chunk: int = 16384,
        test_id: bool = False,
        floater_thresh: float = 0.0,
    ):
        self.sync_window_to_host()
        if blending_weights is None:
            blending_weights = self.blending_weights[np.asarray(view_ids)]
        if cam2world is None:
            cam2world = self.get_cam2world(view_ids)
        if world2rf is None:
            world2rf = self.world2rf

        active_rf_ids = [
            int(i) for i in np.nonzero(blending_weights.sum(axis=0))[0]
        ]
        if not active_rf_ids:
            raise RuntimeError("No valid field for the requested views")

        focal = self.focal(w)
        center = self.center(w, h)

        n_rays = ray_ids.shape[0]
        rays_per_view = n_rays // len(view_ids)
        chunk = max(chunk // len(active_rf_ids), 1)
        rgbs = np.zeros((n_rays, 3), np.float32)
        depths = np.zeros((n_rays,), np.float32)
        bw_exp = np.repeat(blending_weights, rays_per_view, axis=0)
        c2w_exp = np.repeat(cam2world, rays_per_view, axis=0)

        if len(view_ids) == 1:
            # fast path: all chunks of the frame in ONE lax.scan dispatch per
            # field (a 960x540 frame is ~127 chunks; per-dispatch overhead on
            # tunneled hosts is ~40 ms, so this saves seconds per frame)
            n_chunks = (n_rays + chunk - 1) // chunk
            pad = n_chunks * chunk - n_rays
            ids_p = np.concatenate(
                [np.asarray(ray_ids, np.int32), np.zeros(pad, np.int32)]
            ).reshape(n_chunks, chunk)
            ids_sh = self._eval_ray_sharding(chunk, lead_axis=True)
            ids_dev = (
                jax.device_put(ids_p, ids_sh) if ids_sh is not None
                else jnp.asarray(ids_p)
            )
            for rf_id in active_rf_ids:
                f = self.fields[rf_id]
                params = self._eval_params(f)
                cam2rf = cam2world[0].copy()
                cam2rf[:3, 3] += world2rf[rf_id]
                rgb, depth = render_frame(
                    params,
                    f["cfg"],
                    ids_dev,
                    jnp.asarray(cam2rf),
                    jnp.asarray(focal, jnp.float32),
                    jnp.asarray(center),
                    w=w,
                    h=h,
                    floater_thresh=floater_thresh,
                    fov360=(self.cfg.fov == 360),
                    refine=jnp.asarray(1.0 if self.is_refining else 0.0),
                    alpha_volume=self._eval_alpha(f),
                )
                wgt = float(blending_weights[0, rf_id])
                rgbs += np.asarray(rgb)[:n_rays] * wgt
                depths += np.asarray(depth)[:n_rays] * wgt
        else:
            n_chunks = (n_rays + chunk - 1) // chunk
            for ci in range(n_chunks):
                sl = slice(ci * chunk, min((ci + 1) * chunk, n_rays))
                ids_c = np.asarray(ray_ids[sl], np.int32)
                pad = 0
                if ids_c.shape[0] < chunk:  # pad to keep one compile bucket
                    pad = chunk - ids_c.shape[0]
                    ids_c = np.concatenate([ids_c, np.zeros(pad, np.int32)])
                for rf_id in active_rf_ids:
                    f = self.fields[rf_id]
                    params = self._eval_params(f)
                    cam2rf = c2w_exp[sl].copy()
                    cam2rf[:, :3, 3] += world2rf[rf_id]
                    if pad:
                        cam2rf = np.concatenate(
                            [cam2rf, np.repeat(cam2rf[-1:], pad, axis=0)]
                        )
                    ids_sh = self._eval_ray_sharding(chunk, lead_axis=False)
                    rgb, depth, _, _ = render_chunk(
                        params,
                        f["cfg"],
                        jax.device_put(ids_c, ids_sh)
                        if ids_sh is not None
                        else jnp.asarray(ids_c),
                        jax.device_put(cam2rf, ids_sh)
                        if ids_sh is not None
                        else jnp.asarray(cam2rf),
                        jnp.asarray(focal, jnp.float32),
                        jnp.asarray(center),
                        w=w,
                        h=h,
                        floater_thresh=floater_thresh,
                        fov360=(self.cfg.fov == 360),
                        refine=jnp.asarray(1.0 if self.is_refining else 0.0),
                        alpha_volume=self._eval_alpha(f),
                    )
                    rgb = np.asarray(rgb)[: sl.stop - sl.start]
                    depth = np.asarray(depth)[: sl.stop - sl.start]
                    wgt = bw_exp[sl, rf_id]
                    rgbs[sl] += rgb * wgt[:, None]
                    depths[sl] += depth * wgt

        if self.cfg.lr_exposure_init > 0:
            n = self.n_frames
            v = np.asarray(view_ids)
            if test_id:
                v_m = np.maximum(v - 1, 0)
                v_m = np.where(v_m == v, 1, v_m)
                v_p = np.minimum(v + 1, n - 1)
                exposure = (self.exp_all[v_m] + self.exp_all[v_p]) / 2
            else:
                exposure = self.exp_all[v]
            exposure = np.repeat(exposure, rays_per_view, axis=0)
            rgbs = np.einsum("bij,bj->bi", exposure, rgbs)
        rgbs = np.clip(rgbs, 0, 1)

        i = np.asarray(ray_ids) % w
        j = (np.asarray(ray_ids) // w) % h
        directions = np.stack(
            [
                (i + 0.5 - center[0]) / focal,
                -(j + 0.5 - center[1]) / focal,
                -np.ones_like(i, np.float32),
            ],
            axis=-1,
        ).astype(np.float32)
        ij = np.stack([i, j], axis=-1)
        return rgbs, depths, directions, ij
