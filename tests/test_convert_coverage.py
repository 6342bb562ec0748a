"""Checkpoint-converter key-consumption guards (VERDICT r3 item 6 tail).

The value-level round trips (tests/test_raft_parity.py graph parity through
convert.py, tests/test_dpt.py vs the official transformers graph,
tests/test_lpips.py replica) catch layout/transpose bugs; what they cannot
catch is a converter that silently DROPS a weight the network needs (the
JAX tree would simply be built without it, and a missing optional-looking
key never errors). These tests wrap the state dict in a key-access recorder
and assert every checkpoint entry is consumed.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, __file__.rsplit("/", 1)[0])


class _Recorder(dict):
    def __init__(self, sd):
        super().__init__(sd)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        self.accessed.add(k)
        return super().get(k, default)


def test_raft_converter_consumes_every_checkpoint_key():
    from test_raft_parity import _random_state_dict

    from localrf_tpu.preprocess.convert import convert_raft_state_dict

    sd = {
        k.replace("module.", ""): v.numpy()
        for k, v in _random_state_dict().items()
    }
    rec = _Recorder(sd)
    convert_raft_state_dict(rec)
    # num_batches_tracked is a torch BN bookkeeping buffer with no math
    unused = {
        k for k in sd if k not in rec.accessed
        and not k.endswith("num_batches_tracked")
    }
    assert not unused, f"converter silently dropped weights: {sorted(unused)}"


def test_dpt_converter_consumes_every_checkpoint_key():
    pytest.importorskip("transformers")
    from transformers import DPTConfig, DPTForDepthEstimation

    from localrf_tpu.preprocess.dpt import DPTConfigJ, convert_dpt_state_dict

    torch.manual_seed(0)
    model = DPTForDepthEstimation(DPTConfig()).eval()
    cfg = DPTConfigJ()
    sd = {k: v for k, v in model.state_dict().items()}
    rec = _Recorder(sd)
    convert_dpt_state_dict(rec, cfg)
    # dpt.layernorm is the encoder's FINAL layernorm: DPTForDepthEstimation's
    # neck taps the pre-layernorm per-stage hidden states (HF
    # backbone_out_indices), so the depth path never applies it — confirmed
    # by the exact-graph parity vs the official torch model (test_dpt.py)
    legitimately_unused = {"dpt.layernorm.weight", "dpt.layernorm.bias"}
    unused = {
        k for k in sd if k not in rec.accessed
        and not k.endswith("num_batches_tracked")
        and k not in legitimately_unused
    }
    assert not unused, f"converter silently dropped weights: {sorted(unused)}"
