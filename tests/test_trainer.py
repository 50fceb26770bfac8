"""Trainer engine tests: scheduler, resume, graceful preemption."""

import os
import signal
import threading

import numpy as np
import jax.numpy as jnp
import pytest

from multiposenet_tpu.config import Config, ModelConfig, DataConfig, TrainConfig
from multiposenet_tpu.data.loader import Loader
from multiposenet_tpu.engine import checkpoint as ckpt_lib
from multiposenet_tpu.engine.trainer import ReduceLROnPlateau, Trainer


class SynthDS:
    def __len__(self):
        return 16

    def __getitem__(self, i, rng=None):
        r = np.random.RandomState(i)
        joints = np.full((2, 18, 3), 2.0, np.float32)
        joints[0, :, 0] = r.uniform(10, 86, 18)
        joints[0, :, 1] = r.uniform(10, 86, 18)
        joints[0, :, 2] = 1.0
        return {"image": (r.rand(96, 96, 3) * 255).astype(np.uint8),
                "joints": joints,
                "mask": np.ones((24, 24), np.float32)}


def _cfg(tmp, **tr):
    return Config(
        model=ModelConfig(backbone="resnet50"),
        data=DataConfig(inp_size=96),
        train=TrainConfig(subnet="keypoint", batch_size=8, max_epoch=1,
                          init_lr=1e-4, save_dir=str(tmp), exp_name="t",
                          print_freq=100, val_freq=0, save_freq_step=10 ** 9,
                          val_nbatch_end_epoch=0, **tr))


def test_plateau_scheduler_semantics():
    s = ReduceLROnPlateau(1.0, factor=0.5, patience=2)
    lrs = [s.step(v) for v in [3.0, 2.0, 2.5, 2.4, 2.3, 2.2]]
    # bad epochs: 2.5, 2.4, 2.3 -> reduce on the 3rd (patience 2 exceeded)
    assert lrs == [1.0, 1.0, 1.0, 1.0, 0.5, 0.5]


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_sigterm_checkpoints_and_exits(tmp_path):
    cfg = _cfg(tmp_path)
    loader = Loader(SynthDS(), batch_size=8, num_workers=1)
    t = Trainer(cfg, train_data=loader, val_data=None)
    t.install_signal_handlers()

    killer = threading.Timer(0.1, lambda: os.kill(os.getpid(), signal.SIGTERM))
    killer.start()
    with pytest.raises(SystemExit):
        t.train()
    killer.cancel()
    save_dir = os.path.join(str(tmp_path), "t")
    assert ckpt_lib.list_checkpoints(save_dir), "no checkpoint on SIGTERM"
    # default handlers restored for the rest of the test session
    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    signal.signal(signal.SIGINT, signal.default_int_handler)


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_auto_resume_roundtrip(tmp_path):
    cfg = _cfg(tmp_path)
    loader = Loader(SynthDS(), batch_size=8, num_workers=1)
    t = Trainer(cfg, train_data=loader, val_data=loader)
    t.train()
    assert t.last_epoch == 1
    # a fresh Trainer picks up the newest checkpoint automatically
    t2 = Trainer(cfg, train_data=loader, val_data=loader)
    assert t2.last_epoch == 1
    assert int(t2.state.step) == int(t.state.step)
    # global_step must resync from the restored state so step-suffixed ckpt
    # names stay monotonic across resumes (stale-resume regression)
    assert t2.global_step == int(t2.state.step)


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_three_stage_chain_partial_init_and_freeze(tmp_path):
    """The reference's staged recipe end-to-end (multipose_keypoint_train ->
    multipose_detection_train -> multipose_prn_train): each stage starts
    from the previous stage's checkpoint via partial init, trains ONLY its
    own freeze-group, and carries everything else through bit-unchanged."""
    import jax
    from multiposenet_tpu.engine.train_steps import param_group

    class DetDS:
        def __len__(self):
            return 8

        def __getitem__(self, i, rng=None):
            r = np.random.RandomState(100 + i)
            boxes = np.full((4, 5), -1.0, np.float32)
            boxes[0] = [10, 10, 60, 70, 0]
            return {"image": (r.rand(96, 96, 3) * 255).astype(np.uint8),
                    "boxes": boxes}

    class PRNDS:
        def __len__(self):
            return 8

        def __getitem__(self, i, rng=None):
            r = np.random.RandomState(200 + i)
            m = (r.rand(56, 36, 17) > 0.99).astype(np.float32)
            return {"weights_marks": m, "label_marks": m}

    def stage_cfg(subnet, exp):
        return Config(
            model=ModelConfig(backbone="resnet50"),
            data=DataConfig(inp_size=96),
            train=TrainConfig(subnet=subnet, batch_size=8, max_epoch=1,
                              init_lr=1e-3, save_dir=str(tmp_path),
                              exp_name=exp, print_freq=100, val_freq=0,
                              save_freq_step=10 ** 9,
                              val_nbatch_end_epoch=0))

    def flat(tree):
        return {tuple(k.key for k in path): np.asarray(v) for path, v in
                jax.tree_util.tree_flatten_with_path(tree)[0]}

    # stage 1: keypoint (trains backbone + keypoint FPN head + keypoint head)
    t1 = Trainer(stage_cfg("keypoint", "s1"),
                 train_data=Loader(SynthDS(), batch_size=8, num_workers=1),
                 val_data=Loader(SynthDS(), batch_size=8, num_workers=1))
    t1.train()
    ck1 = ckpt_lib.latest_checkpoint(os.path.join(str(tmp_path), "s1"))
    assert ck1
    p1 = flat(t1.state.params)
    bs1 = flat(t1.state.batch_stats)
    # keypoint training ran BN in train mode — running stats moved off init
    assert any(np.abs(v).max() > 0 for k, v in bs1.items() if k[-1] == "mean")

    # stage 2: detection from the stage-1 checkpoint
    t2 = Trainer(stage_cfg("detection", "s2"),
                 train_data=Loader(DetDS(), batch_size=8, num_workers=1),
                 val_data=Loader(DetDS(), batch_size=8, num_workers=1),
                 init_ckpt_params=ck1)
    p2_init = flat(t2.state.params)
    for k in p1:   # partial init carries the FULL stage-1 tree
        np.testing.assert_array_equal(p2_init[k], p1[k], err_msg=str(k))
    # ... INCLUDING BN running stats: detection runs the backbone frozen on
    # running averages, so stage-1's stats are the features it sees
    # (reference load_net carries running_mean/var, net_utils.py:69-110)
    bs2_init = flat(t2.state.batch_stats)
    for k in bs1:
        np.testing.assert_array_equal(bs2_init[k], bs1[k], err_msg=str(k))
    t2.train()
    p2 = flat(t2.state.params)
    bs2 = flat(t2.state.batch_stats)
    for k in bs1:  # BN frozen in the detection stage: stats bit-unchanged
        np.testing.assert_array_equal(bs2[k], bs1[k], err_msg=str(k))
    changed = {param_group(k) for k in p1
               if not np.array_equal(p2[k], p1[k])}
    assert changed <= {"fpn_retina", "retinanet"}, changed
    assert "retinanet" in changed   # the detection heads actually trained

    # stage 3: PRN from the stage-2 checkpoint
    ck2 = ckpt_lib.latest_checkpoint(os.path.join(str(tmp_path), "s2"))
    t3 = Trainer(stage_cfg("prn", "s3"),
                 train_data=Loader(PRNDS(), batch_size=8, num_workers=1),
                 val_data=Loader(PRNDS(), batch_size=8, num_workers=1),
                 init_ckpt_params=ck2)
    t3.train()
    p3 = flat(t3.state.params)
    changed3 = {param_group(k) for k in p2
                if not np.array_equal(p3[k], p2[k])}
    assert changed3 == {"prn"}, changed3
