"""Checkpoint save/restore/partial-load and torch-ckpt conversion mapping."""

import os
import sys

import numpy as np

from multiposenet_tpu.engine import checkpoint as ckpt_lib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_ckpt import torch_key_to_paths  # noqa: E402


def _tree():
    return {
        "params": {
            "a": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3),
                  "bias": np.zeros(3, np.float32)},
            "b": {"w": np.ones((4,), np.float32)},
        },
        "step": np.asarray(7),
    }


def test_save_restore_roundtrip(tmp_path):
    d = str(tmp_path / "ckpts")
    t = _tree()
    ckpt_lib.save_checkpoint(d, t, epoch=3)
    assert ckpt_lib.list_checkpoints(d) == [(3, -1)]
    ckpt_lib.save_checkpoint(d, t, epoch=5)
    assert ckpt_lib.latest_checkpoint(d).endswith("ckpt_5")

    restored = ckpt_lib.restore_checkpoint(os.path.join(d, "ckpt_3"), t)
    np.testing.assert_array_equal(restored["params"]["a"]["kernel"],
                                  t["params"]["a"]["kernel"])
    assert int(restored["step"]) == 7


def test_checkpoint_pruning(tmp_path):
    d = str(tmp_path / "ckpts")
    t = _tree()
    for e in range(1, 6):
        ckpt_lib.save_checkpoint(d, t, epoch=e, max_n_ckpts=2)
    assert ckpt_lib.list_checkpoints(d) == [(4, -1), (5, -1)]


def test_step_checkpoints_distinct_and_ordered(tmp_path):
    """Two preemptions in one epoch must not overwrite each other
    (docs/ROADMAP.md item 8), and resume must pick the newest."""
    d = str(tmp_path / "ckpts")
    t = _tree()
    ckpt_lib.save_checkpoint(d, t, epoch=2)                 # epoch 2 done
    p1 = ckpt_lib.save_checkpoint(d, t, epoch=3, step=100)  # preempt 1
    p2 = ckpt_lib.save_checkpoint(d, t, epoch=3, step=250)  # preempt 2
    assert p1 != p2 and os.path.isdir(p1) and os.path.isdir(p2)
    assert ckpt_lib.latest_checkpoint(d).endswith("ckpt_3_s250")
    # finishing epoch 3 outranks its step ckpts
    ckpt_lib.save_checkpoint(d, t, epoch=3)
    assert ckpt_lib.latest_checkpoint(d).endswith("ckpt_3")
    assert ckpt_lib.list_checkpoints(d) == [
        (2, -1), (3, 100), (3, 250), (3, -1)]
    # pruning keeps the newest two in that order
    ckpt_lib.save_checkpoint(d, t, epoch=4, step=10, max_n_ckpts=2)
    assert ckpt_lib.list_checkpoints(d) == [(3, -1), (4, 10)]


def test_partial_restore_tolerates_mismatch(tmp_path):
    d = str(tmp_path / "ckpts")
    t = _tree()
    ckpt_lib.save_checkpoint(d, t, epoch=1)

    template = {
        "a": {"kernel": np.zeros((2, 3), np.float32),     # matches
              "bias": np.zeros((9,), np.float32)},        # shape mismatch
        "c": {"new": np.full((2,), 5.0, np.float32)},     # missing in ckpt
    }
    out, stats = ckpt_lib.restore_params_partial(
        os.path.join(d, "ckpt_1"), template)
    assert stats["loaded"] == 1
    assert stats["shape_skipped"] == 1
    assert stats["missing"] >= 1
    np.testing.assert_array_equal(out["a"]["kernel"],
                                  t["params"]["a"]["kernel"])
    np.testing.assert_array_equal(out["c"]["new"], template["c"]["new"])


def test_best_copy(tmp_path):
    d = str(tmp_path / "ckpts")
    p = ckpt_lib.save_checkpoint(d, _tree(), epoch=2)
    best = ckpt_lib.copy_best(p, 0.12345)
    assert os.path.isdir(best) and best.endswith("_0.12345.best")


# ------------------------------------------------------------- converter map

def test_torch_key_mapping():
    cases = {
        "fpn.conv1.weight": (("fpn", "conv1"), "weight"),
        "fpn.bn1.running_mean": (("fpn", "bn1"), "running_mean"),
        "fpn.layer1.0.conv2.weight": (("fpn", "layer1_0", "conv2"), "weight"),
        "fpn.layer3.22.bn3.bias": (("fpn", "layer3_22", "bn3"), "bias"),
        "fpn.layer2.0.downsample.0.weight":
            (("fpn", "layer2_0", "downsample_conv"), "weight"),
        "fpn.layer2.0.downsample.1.running_var":
            (("fpn", "layer2_0", "downsample_bn"), "running_var"),
        "fpn.latlayer1.weight": (("fpn", "latlayer1"), "weight"),
        "fpn.toplayer.bias": (("fpn", "toplayer"), "bias"),
        "convt1.weight": (("keypoint_head", "convt1"), "weight"),
        "convfin_k3.bias": (("keypoint_head", "convfin_k3"), "bias"),
        "regressionModel.output.weight":
            (("regression_head", "output"), "weight"),
        "classificationModel.conv4.bias":
            (("classification_head", "conv4"), "bias"),
        "prn.dens1.weight": (("prn", "dens1"), "weight"),
        "module.fpn.conv1.weight": (("fpn", "conv1"), "weight"),
    }
    for k, expect in cases.items():
        assert torch_key_to_paths(k) == expect, k
    assert torch_key_to_paths("anchors.foo") is None
    assert torch_key_to_paths("prn.softmax.bogus") is None


def test_converted_tree_matches_model_shapes(tmp_path):
    """Synthesize a torch-style h5 for a tiny subset and convert it."""
    import h5py
    from convert_torch_ckpt import convert

    h5p = str(tmp_path / "ckpt.h5")
    with h5py.File(h5p, "w") as f:
        f.create_dataset("fpn.conv1.weight", data=np.ones((64, 3, 7, 7), np.float32))
        f.create_dataset("fpn.bn1.weight", data=np.ones(64, np.float32))
        f.create_dataset("fpn.bn1.running_mean", data=np.zeros(64, np.float32))
        f.create_dataset("prn.dens1.weight", data=np.ones((1024, 34272), np.float32))
        f.create_dataset("prn.dens1.bias", data=np.zeros(1024, np.float32))

    params, batch_stats, skipped = convert(h5p)
    assert params["fpn"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert params["fpn"]["bn1"]["scale"].shape == (64,)
    assert batch_stats["fpn"]["bn1"]["mean"].shape == (64,)
    assert params["prn"]["dens1"]["kernel"].shape == (34272, 1024)
    assert not skipped
