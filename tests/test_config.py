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
