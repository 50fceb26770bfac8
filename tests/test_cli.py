"""CLI plumbing: config building and loader construction from a fabricated
COCO tree (no network, no real training)."""

import json
import os
import sys

import cv2
import numpy as np
import pytest

from multiposenet_tpu.cli import build_config, make_loaders, main

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


class Args:
    backbone = "resnet50"
    coco_root = ""
    ckpt = None
    exp_name = "e"
    inp_size = 96
    batch_size = 4
    lr = 2e-4
    max_epoch = 3
    num_workers = 1
    save_dir = "/tmp/cli_models"
    init_params = None


@pytest.fixture(scope="module")
def coco_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco"))
    os.makedirs(root + "/annotations")
    os.makedirs(root + "/images")
    os.makedirs(root + "/val2017")
    os.makedirs(root + "/mask2014")

    def person(aid, img_id, nk, bbox):
        kps = []
        for j in range(17):
            kps += ([bbox[0] + 5 + j, bbox[1] + 5 + j, 2] if j < nk else [0, 0, 0])
        seg = [[bbox[0], bbox[1], bbox[0] + bbox[2], bbox[1],
                bbox[0] + bbox[2], bbox[1] + bbox[3], bbox[0], bbox[1] + bbox[3]]]
        return {"id": aid, "image_id": img_id, "category_id": 1, "iscrowd": 0,
                "num_keypoints": nk, "area": bbox[2] * bbox[3], "bbox": bbox,
                "keypoints": kps, "segmentation": seg}

    img = (np.random.RandomState(0).rand(120, 160, 3) * 255).astype(np.uint8)
    for name in ("COCO_val2014_000000000001.jpg",):
        cv2.imwrite(os.path.join(root, "images", name), img)
    cv2.imwrite(os.path.join(root, "val2017", "v.jpg"), img)

    ds17 = {"images": [{"id": 1, "height": 120, "width": 160,
                        "file_name": "v.jpg"}],
            "categories": [{"id": 1, "name": "person"}],
            "annotations": [person(1, 1, 10, [10, 10, 60, 80])]}
    with open(root + "/annotations/person_keypoints_val2017.json", "w") as f:
        json.dump(ds17, f)

    # keypoint index via the generator tool
    from make_coco_json import process_split
    from multiposenet_tpu.data.coco_json import COCOIndex
    idx = COCOIndex(dataset={
        "images": [{"id": 1, "height": 120, "width": 160,
                    "file_name": "COCO_val2014_000000000001.jpg"}],
        "categories": [{"id": 1, "name": "person"}],
        "annotations": [person(1, 1, 12, [10, 10, 60, 80])]})
    records = []
    process_split(idx, "COCO_val", set(), records, root + "/mask2014", 0)
    with open(root + "/COCO.json", "w") as f:
        json.dump({"root": records}, f)
    return root


def test_build_config_applies_overrides(coco_tree):
    a = Args()
    a.coco_root = coco_tree
    cfg = build_config(a, "keypoint")
    assert cfg.model.backbone == "resnet50"
    assert cfg.data.inp_size == 96
    assert cfg.train.batch_size == 4
    assert cfg.train.init_lr == 2e-4
    assert cfg.train.max_epoch == 3
    assert cfg.data.json_path.endswith("COCO.json")
    # --inp-size also drives the EVAL base size (reference TestParams
    # inp_size, tester.py:87) — eval commands were silently ignoring it
    assert cfg.eval.inp_size == 96
    # stage presets survive (keypoint subnet)
    assert cfg.train.subnet == "keypoint"


def test_make_loaders_keypoint_and_prn_and_detection(coco_tree):
    a = Args()
    a.coco_root = coco_tree
    cfg = build_config(a, "keypoint")
    kl = make_loaders(cfg, "keypoint", training=True)
    assert len(kl.dataset) == 1

    cfg = build_config(a, "prn")
    pl = make_loaders(cfg, "prn", training=False)
    assert len(pl.dataset) == 1
    item = pl.dataset[0]
    assert item["weights_marks"].shape == (56, 36, 17)

    cfg = build_config(a, "detection")
    dl = make_loaders(cfg, "detection", training=False)
    assert len(dl.dataset) == 1
    ditem = dl.dataset.__getitem__(0, rng=np.random.default_rng(0))
    assert ditem["image"].shape == (96, 96, 3)
    assert ditem["boxes"].shape == (cfg.data.max_gt_boxes, 5)


def test_cli_errors(capsys):
    with pytest.raises(SystemExit):
        main(["test", "--testdata", "/definitely/missing"])
    with pytest.raises(SystemExit):
        main(["coco-eval", "--coco-root", "/definitely/missing"])
    # export-stablehlo without --ckpt would bake random init weights into
    # a valid-looking deployment artifact — must refuse before model init
    with pytest.raises(SystemExit):
        main(["export-stablehlo", "/tmp/never_written.stablehlo"])


def test_build_config_bf16_flag(coco_tree):
    import jax.numpy as jnp
    a = Args()
    a.coco_root = coco_tree
    assert build_config(a, "keypoint").model.compute_dtype == jnp.float32
    a.bf16 = True
    assert build_config(a, "keypoint").model.compute_dtype == jnp.bfloat16


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_load_eval_carries_batch_stats(coco_tree, tmp_path):
    """_load_eval must restore BN running stats, not only params — the
    reference's Tester loads the full state_dict via load_net
    (net_utils.py:69-110).  Regression for the round-2 bug where CLI evals
    ran the backbone on init (mean 0, var 1) stats and produced zero
    detections."""
    import jax
    from multiposenet_tpu import cli
    from multiposenet_tpu.config import ModelConfig
    from multiposenet_tpu.engine import checkpoint as ckpt_lib
    from multiposenet_tpu.models.posenet import PoseNet
    import jax.numpy as jnp

    model = PoseNet(ModelConfig(backbone="resnet50"))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3), jnp.float32),
        jnp.zeros((1, 56, 36, 17), jnp.float32), method=PoseNet.init_all)
    # fabricate "trained" running stats distinguishable from init
    trained_bs = jax.tree.map(lambda v: np.asarray(v) + 1.25,
                              jax.device_get(variables["batch_stats"]))
    ckpt_lib.save_checkpoint(
        str(tmp_path / "ck"),
        {"params": jax.device_get(variables["params"]),
         "batch_stats": trained_bs, "step": np.asarray(5)}, epoch=1)

    a = Args()
    a.coco_root = coco_tree
    a.ckpt = str(tmp_path / "ck" / "ckpt_1")
    _, ev = cli._load_eval(a, subnet="keypoint")
    got = jax.device_get(ev.params["batch_stats"])
    flat_got, flat_want = jax.tree.leaves(got), jax.tree.leaves(trained_bs)
    assert len(flat_got) == len(flat_want) > 0
    for g, w in zip(flat_got, flat_want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # --fold-bn: the evaluator must be rebuilt on the folded graph with
    # the BN collections consumed into conv weights (models/fold_bn.py),
    # folding the SAME loaded state (incl. the trained running stats above)
    from multiposenet_tpu.models.fold_bn import fold_bn_variables
    a.fold_bn = True
    fcfg, fev = cli._load_eval(a, subnet="keypoint")
    assert fcfg.model.fold_bn
    assert set(fev.params) == {"params"}
    want = fold_bn_variables(
        {"params": variables["params"], "batch_stats": trained_bs})
    for g, w in zip(jax.tree.leaves(jax.device_get(fev.params)),
                    jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)
