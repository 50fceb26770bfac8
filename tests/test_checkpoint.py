"""Checkpoint save/restore/partial-load and torch-ckpt conversion mapping."""

import os
import sys

import numpy as np
import pytest

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


def test_async_saver_roundtrip_and_order(tmp_path):
    """AsyncSaver writes every enqueued checkpoint (in order, so pruning
    sees them newest-last), wait() returns the newest path, and restored
    contents match what was enqueued — save() snapshots jax.Array AND
    np.ndarray leaves at enqueue time (see test_async_saver_snapshots_
    host_leaves for the in-place-mutation proof)."""
    d = str(tmp_path / "ckpts")
    saver = ckpt_lib.AsyncSaver()
    t1 = _tree()
    fut1 = saver.save(d, t1, epoch=1)
    t2 = _tree()
    t2["params"]["b"]["w"] = np.full((4,), 9.0, np.float32)
    saver.save(d, t2, epoch=2, max_n_ckpts=2)
    path = saver.wait()
    assert path.endswith("ckpt_2") and fut1.result().endswith("ckpt_1")
    assert ckpt_lib.list_checkpoints(d) == [(1, -1), (2, -1)]
    r1 = ckpt_lib.restore_checkpoint(os.path.join(d, "ckpt_1"), t1)
    r2 = ckpt_lib.restore_checkpoint(os.path.join(d, "ckpt_2"), t1)
    np.testing.assert_array_equal(r1["params"]["b"]["w"], np.ones(4))
    np.testing.assert_array_equal(r2["params"]["b"]["w"], np.full(4, 9.0))
    # wait() with nothing pending is a no-op returning None
    assert saver.wait() is None


def test_async_saver_propagates_failure(tmp_path):
    """A failed background save must surface at wait(), not vanish."""
    f = tmp_path / "not_a_dir"
    f.write_text("occupied")
    saver = ckpt_lib.AsyncSaver()
    saver.save(str(f), _tree(), epoch=1)  # save_dir path is a FILE
    try:
        saver.wait()
    except OSError:
        pass
    else:
        raise AssertionError("expected the background failure to re-raise")


def test_async_saver_snapshots_host_leaves(tmp_path, monkeypatch):
    """In-place mutation of a NUMPY leaf after enqueue must not leak into
    the written checkpoint — save() copies np.ndarray leaves in the
    snapshot, not just jax.Arrays (ADVICE r2).  The worker is gated so the
    mutation provably happens before the write."""
    import threading

    release = threading.Event()
    real = ckpt_lib.save_checkpoint

    def gated(*a, **kw):
        release.wait(timeout=30)
        return real(*a, **kw)

    monkeypatch.setattr(ckpt_lib, "save_checkpoint", gated)
    d = str(tmp_path / "ckpts")
    saver = ckpt_lib.AsyncSaver()
    t = _tree()
    saver.save(d, t, epoch=1)
    t["params"]["b"]["w"][...] = -7.0  # mutate host copy before worker runs
    release.set()
    saver.wait()
    r = ckpt_lib.restore_checkpoint(os.path.join(d, "ckpt_1"), _tree())
    np.testing.assert_array_equal(r["params"]["b"]["w"], np.ones(4))


def test_async_saver_backpressure(tmp_path, monkeypatch):
    """At most one save is ever in flight: a second save() blocks until the
    first completes, so pinned snapshots cannot accumulate and OOM HBM when
    storage is slower than save_freq_step (ADVICE r2, medium)."""
    import threading

    started = threading.Event()
    release = threading.Event()
    real = ckpt_lib.save_checkpoint

    def gated(*a, **kw):
        started.set()
        release.wait(timeout=30)
        return real(*a, **kw)

    monkeypatch.setattr(ckpt_lib, "save_checkpoint", gated)
    d = str(tmp_path / "ckpts")
    saver = ckpt_lib.AsyncSaver()
    fut1 = saver.save(d, _tree(), epoch=1)
    assert started.wait(timeout=30)

    result = {}

    def second():
        result["fut2"] = saver.save(d, _tree(), epoch=2)
        result["fut1_done_at_enqueue"] = fut1.done()

    th = threading.Thread(target=second)
    th.start()
    th.join(timeout=0.5)
    assert th.is_alive(), "second save() should block on the in-flight save"
    release.set()
    th.join(timeout=30)
    assert not th.is_alive()
    assert result["fut1_done_at_enqueue"]
    assert saver.wait().endswith("ckpt_2")


def test_async_saver_wait_collects_all_failures(tmp_path):
    """wait() completes ALL futures before re-raising the FIRST failure —
    a failure followed by a successful save still surfaces (and the
    successful write exists on disk), and a fresh wait() is clean."""
    bad = tmp_path / "not_a_dir"
    bad.write_text("occupied")
    good = str(tmp_path / "ckpts")
    saver = ckpt_lib.AsyncSaver()
    saver.save(str(bad), _tree(), epoch=1)   # fails: save_dir is a FILE
    saver.save(good, _tree(), epoch=2)       # succeeds
    try:
        saver.wait()
    except OSError:
        pass
    else:
        raise AssertionError("expected the first failure to re-raise")
    assert ckpt_lib.latest_checkpoint(good).endswith("ckpt_2")
    assert saver.wait() is None  # drained: no stale failures re-surface


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


def test_model_state_partial_restores_batch_stats(tmp_path):
    """Eval/staged-init loads must carry BN running stats: the reference's
    load_net restores the full state_dict incl. running_mean/var
    (net_utils.py:69-110).  Regression for the round-2 synthetic E2E bug
    where eval ran the backbone on init (mean 0, var 1) stats."""
    d = str(tmp_path / "ckpts")
    state = {
        "params": {"a": {"kernel": np.ones((2, 3), np.float32)}},
        "batch_stats": {"bn": {"mean": np.full((4,), 2.5, np.float32),
                               "var": np.full((4,), 0.3, np.float32)}},
        "opt_state": {"count": np.asarray(3)},
        "step": np.asarray(11),
    }
    ckpt_lib.save_checkpoint(d, state, epoch=1)
    path = os.path.join(d, "ckpt_1")

    template = {"params": {"a": {"kernel": np.zeros((2, 3), np.float32)}},
                "batch_stats": {"bn": {"mean": np.zeros((4,), np.float32),
                                       "var": np.ones((4,), np.float32)}}}
    out, stats = ckpt_lib.restore_variables_partial(path, template)
    np.testing.assert_array_equal(out["params"]["a"]["kernel"],
                                  state["params"]["a"]["kernel"])
    np.testing.assert_array_equal(out["batch_stats"]["bn"]["mean"],
                                  state["batch_stats"]["bn"]["mean"])
    np.testing.assert_array_equal(out["batch_stats"]["bn"]["var"],
                                  state["batch_stats"]["bn"]["var"])
    assert stats["bn_loaded"] == 2

    # three-way variant used by the Trainer
    params, bs, st3 = ckpt_lib.restore_model_state_partial(
        path, template["params"], template["batch_stats"])
    np.testing.assert_array_equal(bs["bn"]["var"],
                                  state["batch_stats"]["bn"]["var"])
    assert st3["bn_loaded"] == 2


def test_model_state_partial_without_batch_stats_keeps_template(tmp_path):
    """A checkpoint with no batch_stats (foreign/legacy) keeps init stats
    instead of crashing, and reports bn_loaded == 0."""
    d = str(tmp_path / "ckpts")
    ckpt_lib.save_checkpoint(
        d, {"params": {"a": {"kernel": np.ones((2,), np.float32)}}}, epoch=1)
    template_bs = {"bn": {"mean": np.full((3,), 7.0, np.float32)}}
    params, bs, stats = ckpt_lib.restore_model_state_partial(
        os.path.join(d, "ckpt_1"),
        {"a": {"kernel": np.zeros((2,), np.float32)}}, template_bs)
    np.testing.assert_array_equal(params["a"]["kernel"], np.ones(2))
    np.testing.assert_array_equal(bs["bn"]["mean"], template_bs["bn"]["mean"])
    assert stats["bn_loaded"] == 0


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


def _reference_torch_keys(blocks):
    """Every parameter/buffer key a reference poseNet state_dict contains
    (names from reference fpn.py:37-74, posenet.py:154-224; ResNet convs
    carry no bias — BN follows each)."""
    bn = ["weight", "bias", "running_mean", "running_var",
          "num_batches_tracked"]
    keys = ["fpn.conv1.weight"] + [f"fpn.bn1.{l}" for l in bn]
    for li, n in enumerate(blocks, 1):
        for b in range(n):
            p = f"fpn.layer{li}.{b}"
            for c in (1, 2, 3):
                keys.append(f"{p}.conv{c}.weight")
                keys += [f"{p}.bn{c}.{l}" for l in bn]
            if b == 0:
                keys.append(f"{p}.downsample.0.weight")
                keys += [f"{p}.downsample.1.{l}" for l in bn]
    for name in ["conv6", "conv7", "latlayer1", "latlayer2", "latlayer3",
                 "toplayer0", "toplayer1", "toplayer2",
                 "toplayer", "flatlayer1", "flatlayer2", "flatlayer3",
                 "smooth1", "smooth2", "smooth3"]:
        keys += [f"fpn.{name}.weight", f"fpn.{name}.bias"]
    for name in ["convt1", "convt2", "convt3", "convt4",
                 "convs1", "convs2", "convs3", "convs4",
                 "conv2", "convfin",
                 "convfin_k2", "convfin_k3", "convfin_k4", "convfin_k5"]:
        keys += [f"{name}.weight", f"{name}.bias"]
    for mod in ["regressionModel", "classificationModel"]:
        for name in ["conv1", "conv2", "conv3", "conv4", "output"]:
            keys += [f"{mod}.{name}.weight", f"{mod}.{name}.bias"]
    for name in ["dens1", "bneck", "dens2"]:
        keys += [f"prn.{name}.weight", f"prn.{name}.bias"]
    return keys


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_full_reference_checkpoint_roundtrip(tmp_path):
    """Convert a COMPLETE synthetic reference checkpoint (every state_dict
    key a real ckpt_baseline_resnet101-style h5 contains, resnet50 sizes)
    and require EXACT coverage of the model tree in both directions plus
    value round-trip — the guarantee that a real baseline AP run never
    hits a silently-missing or mistransposed weight."""
    import h5py
    import jax
    import jax.numpy as jnp
    from convert_torch_ckpt import convert, torch_key_to_paths
    from multiposenet_tpu.config import Config, ModelConfig
    from multiposenet_tpu.models.posenet import PoseNet

    cfg = Config(model=ModelConfig(backbone="resnet50"))
    model = PoseNet(cfg.model)
    ref = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17)),
        method=PoseNet.init_all)

    def leaf(tree, path):
        for p in path:
            if not isinstance(tree, dict) or p not in tree:
                return None
            tree = tree[p]
        return tree

    rng = np.random.RandomState(0)
    written = {}
    h5p = str(tmp_path / "full.h5")
    with h5py.File(h5p, "w") as f:
        for k in _reference_torch_keys([3, 4, 6, 3]):
            mapped = torch_key_to_paths(k)
            tleaf = k.rsplit(".", 1)[1]
            if tleaf == "num_batches_tracked":
                f.create_dataset(k, data=np.int64(1000))
                continue
            assert mapped is not None, f"unmapped reference key {k}"
            path, mleaf = mapped
            if mleaf == "weight":
                v = leaf(ref["params"], path + ("kernel",))
                if v is not None:       # conv or linear
                    v = np.asarray(v)
                    arr = (v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T)
                else:                   # BN scale
                    v = leaf(ref["params"], path + ("scale",))
                    assert v is not None, f"no model leaf for {k} at {path}"
                    arr = np.asarray(v)
            elif mleaf == "bias":
                v = leaf(ref["params"], path + ("bias",))
                assert v is not None, f"no model bias for {k} at {path}"
                arr = np.asarray(v)
            elif mleaf in ("running_mean", "running_var"):
                stat = "mean" if mleaf == "running_mean" else "var"
                v = leaf(ref["batch_stats"], path + (stat,))
                assert v is not None, f"no model batch-stat for {k}"
                arr = np.asarray(v)
            else:
                raise AssertionError(k)
            # distinct values so any transposition/mix-up shows
            arr = arr + rng.rand(*arr.shape).astype(np.float32)
            written[k] = arr
            f.create_dataset(k, data=arr)

    params, batch_stats, skipped = convert(h5p, backbone="resnet50")
    assert not skipped, skipped

    def walk(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from walk(v, prefix + (k,))
            else:
                yield prefix + (k,), v

    # every model leaf covered, exact shape
    for path, v in walk(ref["params"]):
        g = leaf(params, path)
        assert g is not None, f"converted tree missing params/{path}"
        assert tuple(g.shape) == tuple(np.asarray(v).shape), path
    for path, v in walk(ref["batch_stats"]):
        g = leaf(batch_stats, path)
        assert g is not None, f"converted tree missing batch_stats/{path}"
        assert tuple(g.shape) == tuple(np.asarray(v).shape), path
    # no extra leaves beyond the model tree
    for path, _ in walk(params):
        assert leaf(ref["params"], path) is not None, f"extra {path}"
    for path, _ in walk(batch_stats):
        assert leaf(ref["batch_stats"], path) is not None, f"extra {path}"

    # value round-trip through the torch layout transposes
    for k, arr in written.items():
        path, mleaf = torch_key_to_paths(k)
        if mleaf == "weight":
            g = leaf(params, path + ("kernel",))
            if g is not None:
                back = (np.asarray(g).transpose(3, 2, 0, 1)
                        if np.asarray(g).ndim == 4 else np.asarray(g).T)
            else:
                back = np.asarray(leaf(params, path + ("scale",)))
        elif mleaf == "bias":
            back = np.asarray(leaf(params, path + ("bias",)))
        elif mleaf == "running_mean":
            back = np.asarray(leaf(batch_stats, path + ("mean",)))
        else:
            back = np.asarray(leaf(batch_stats, path + ("var",)))
        np.testing.assert_array_equal(back, arr, err_msg=k)

    # the converted tree must be consumable by the real forward
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.zeros((1, 64, 64, 3)),
                      method=PoseNet.full_forward)
    assert out[0].shape == (1, 16, 16, 18)


def test_torchvision_resnet_converter_covers_backbone(tmp_path):
    """Convert a complete synthetic torchvision resnet50 state_dict (the
    stage-1 ImageNet init, reference multipose_keypoint_train.py:73-75)
    and require exact coverage of the backbone subtree of fpn/ — every
    conv1/bn1/layerX_Y leaf present with the model's shape, fc skipped,
    nothing else emitted."""
    import jax
    import jax.numpy as jnp
    from convert_torchvision_resnet import convert, tv_key_to_paths
    from multiposenet_tpu.config import Config, ModelConfig
    from multiposenet_tpu.models.posenet import PoseNet

    cfg = Config(model=ModelConfig(backbone="resnet50"))
    model = PoseNet(cfg.model)
    ref = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17)),
        method=PoseNet.init_all)

    def leaf(tree, path):
        for p in path:
            if not isinstance(tree, dict) or p not in tree:
                return None
            tree = tree[p]
        return tree

    bn = ["weight", "bias", "running_mean", "running_var",
          "num_batches_tracked"]
    keys = ["conv1.weight"] + [f"bn1.{l}" for l in bn]
    for li, n in enumerate([3, 4, 6, 3], 1):
        for b in range(n):
            for c in (1, 2, 3):
                keys.append(f"layer{li}.{b}.conv{c}.weight")
                keys += [f"layer{li}.{b}.bn{c}.{l}" for l in bn]
            if b == 0:
                keys.append(f"layer{li}.{b}.downsample.0.weight")
                keys += [f"layer{li}.{b}.downsample.1.{l}" for l in bn]
    keys += ["fc.weight", "fc.bias"]

    rng = np.random.RandomState(1)
    sd = {}
    for k in keys:
        tleaf = k.rsplit(".", 1)[1]
        if tleaf == "num_batches_tracked":
            sd[k] = np.int64(90)
            continue
        if k.startswith("fc."):
            sd[k] = np.zeros((1000, 2048) if tleaf == "weight" else 1000,
                             np.float32)
            continue
        path, mleaf = tv_key_to_paths(k)
        if mleaf == "weight":
            v = leaf(ref["params"], path + ("kernel",))
            if v is not None:
                arr = np.asarray(v).transpose(3, 2, 0, 1)
            else:
                arr = np.asarray(leaf(ref["params"], path + ("scale",)))
        elif mleaf == "bias":
            arr = np.asarray(leaf(ref["params"], path + ("bias",)))
        else:
            stat = "mean" if mleaf == "running_mean" else "var"
            arr = np.asarray(leaf(ref["batch_stats"], path + (stat,)))
        assert arr is not None and arr.dtype != object, k
        sd[k] = arr + rng.rand(*arr.shape).astype(np.float32)

    params, batch_stats, skipped = convert(sd)
    assert set(skipped) == {"fc.weight", "fc.bias"}, skipped

    backbone = {"conv1", "bn1"} | {
        f"layer{li}_{b}" for li, n in enumerate([3, 4, 6, 3], 1)
        for b in range(n)}

    def walk(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from walk(v, prefix + (k,))
            else:
                yield prefix + (k,), v

    for path, v in walk(ref["params"]["fpn"]):
        if path[0] in backbone:
            g = leaf(params, ("fpn",) + path)
            assert g is not None, f"missing fpn/{path}"
            assert tuple(g.shape) == tuple(np.asarray(v).shape), path
    for path, v in walk(ref["batch_stats"]["fpn"]):
        if path[0] in backbone:
            g = leaf(batch_stats, ("fpn",) + path)
            assert g is not None, f"missing batch_stats fpn/{path}"
    for path, _ in walk(params):
        assert path[0] == "fpn" and path[1] in backbone, f"extra {path}"
