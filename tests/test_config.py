"""CLI / config-file parsing (configargparse-compatible key = value files)."""
import pytest

from localrf_tpu.config import config_parser


def test_defaults_match_reference():
    args = config_parser([])
    assert args.batch_size == 4096
    assert args.lr_R_init == 5e-3 and args.lr_t_init == 5e-4
    assert args.N_voxel_init == 64**3 and args.N_voxel_final == 640**3
    assert args.upsamp_list == [100, 150, 200, 250, 300]
    assert args.update_AlphaMask_list == [100, 200, 300]
    assert args.n_init_frames == 5 and args.n_overlap == 30
    assert args.loss_depth_weight_inital == 0.1
    assert args.loss_flow_weight_inital == 1
    assert args.shadingMode == "MLP_Fea_late_view"
    assert args.fov == 85.6 and args.test_frame_every == 10


def test_every_flag_consumed_or_documented_inert():
    """Every parsed flag must be consumed somewhere in the package or be
    explicitly inventoried in config.INERT_FLAGS with a reason — a flag that
    parses and silently does nothing is a parity bug (VERDICT r3 item 4:
    --nSamples used to be one)."""
    import glob
    import os
    import re

    from localrf_tpu.config import INERT_FLAGS

    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = ""
    for f in glob.glob(os.path.join(pkg, "localrf_tpu", "**", "*.py"), recursive=True):
        if f.endswith(os.path.join("localrf_tpu", "config.py")):
            continue
        src += open(f).read()
    args = config_parser([])
    missing = []
    for flag in vars(args):
        consumed = re.search(
            rf"args\.{flag}\b|getattr\(args, \"{flag}\"", src
        )
        if not consumed and flag not in INERT_FLAGS:
            missing.append(flag)
    assert not missing, f"flags parsed but never consumed nor documented: {missing}"


def test_nsamples_caps_march_length():
    """--nSamples caps samples/ray as min(cap, computed)
    (ref: tensorBase.py:317-327)."""
    from localrf_tpu.models.tensorf import TensorfConfig

    cfg = TensorfConfig(grid_size=(64, 64, 64))
    computed = cfg.n_samples
    assert computed > 10
    capped = TensorfConfig(grid_size=(64, 64, 64), n_samples_cap=10)
    assert capped.n_samples == 10
    # a cap above the computed count is a no-op (the default 1e6 always is)
    loose = TensorfConfig(grid_size=(64, 64, 64), n_samples_cap=computed + 50)
    assert loose.n_samples == computed


def test_nsamples_flag_reaches_model(tmp_path):
    """The parsed --nSamples flag must plumb into TensorfConfig via the
    trainer's config construction (not just parse)."""
    import numpy as np

    from localrf_tpu import train as train_mod

    args = config_parser(["--nSamples", "17"])

    class _FakeDS:
        scene_bbox = np.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
        num_images = 5
        img_wh = (8, 6)
        rel_poses = None
        transforms = None

    model = train_mod._make_model(args, _FakeDS())
    assert model.fields[-1]["cfg"].n_samples_cap == 17
    assert model.fields[-1]["cfg"].n_samples <= 17


def test_config_file_support(tmp_path):
    cfgfile = tmp_path / "scene.txt"
    cfgfile.write_text(
        """# comment line
datadir = /data/forest1
fov = 59
batch_size = 2048
upsamp_list = [100, 150, 200]
"""
    )
    args = config_parser(["--config", str(cfgfile), "--batch_size", "1024"])
    assert args.datadir == "/data/forest1"
    assert args.fov == 59
    assert args.upsamp_list == [100, 150, 200]
    # explicit CLI overrides the file
    assert args.batch_size == 1024
