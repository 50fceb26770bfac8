"""Convert a reference MultiPoseNet.pytorch HDF5 checkpoint into this
framework's parameter tree.

The reference saves torch state_dict entries as HDF5 datasets, one per key
(reference network/net_utils.py:30-66), e.g. ``fpn.layer1.0.conv1.weight``.
This converter maps those names onto the Flax module tree defined in
multiposenet_tpu/models/* and transposes conv (OIHW -> HWIO) and linear
(out,in -> in,out) weights.  Output is an orbax checkpoint loadable with
engine.checkpoint.restore_variables_partial, enabling AP-parity evaluation of
the published baseline (README.md:38-51) without any torch dependency.

Usage:
  python tools/convert_torch_ckpt.py ckpt_baseline_resnet101.h5 out_dir \
      [--backbone resnet101]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYPOINT_HEAD_KEYS = {
    "convfin_k2", "convfin_k3", "convfin_k4", "convfin_k5",
    "convt1", "convt2", "convt3", "convt4",
    "convs1", "convs2", "convs3", "convs4", "conv2", "convfin",
}


def _assign(tree, path, value):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = value


def torch_key_to_paths(key: str):
    """torch state_dict key -> (collection, path tuple) or None to skip."""
    key = key.replace("module.", "")
    parts = key.split(".")

    def conv_or_bn(mod_path, leaf):
        if leaf == "weight":
            return None  # decided by caller
        return leaf

    # --- fpn ---
    if parts[0] == "fpn":
        sub = parts[1]
        m = re.match(r"layer(\d)", sub)
        if m:
            # fpn.layerX.N.(convY|bnY|downsample.{0,1}).leaf
            block = f"layer{m.group(1)}_{parts[2]}"
            mod = parts[3]
            if mod == "downsample":
                mod = "downsample_conv" if parts[4] == "0" else "downsample_bn"
                leaf = parts[5]
            else:
                leaf = parts[4]
            return ("fpn", block, mod), leaf
        # fpn.conv1 / bn1 / conv6 / latlayer1 / toplayer / smooth1 ...
        return ("fpn", sub), parts[2]

    if parts[0] in KEYPOINT_HEAD_KEYS:
        return ("keypoint_head", parts[0]), parts[1]
    if parts[0] == "regressionModel":
        return ("regression_head", parts[1]), parts[2]
    if parts[0] == "classificationModel":
        return ("classification_head", parts[1]), parts[2]
    if parts[0] == "prn":
        name = parts[1]
        if name in ("dens1", "bneck", "dens2"):
            return ("prn", name), parts[2]
        return None  # flatten/softmax etc have no params
    if parts[0] in ("anchors", "regressBoxes", "clipBoxes", "focalLoss"):
        return None
    return None


def convert(h5_path: str, backbone: str = "resnet101"):
    import h5py

    params: dict = {}
    batch_stats: dict = {}
    skipped = []

    with h5py.File(h5_path, "r") as f:
        keys = []
        f.visit(lambda k: keys.append(k) if isinstance(f[k], h5py.Dataset) else None)
        for k in keys:
            arr = np.asarray(f[k])
            mapped = torch_key_to_paths(k)
            if mapped is None:
                skipped.append(k)
                continue
            path, leaf = mapped
            is_linear = path[0] == "prn"
            if leaf == "weight":
                if arr.ndim == 4:       # conv OIHW -> HWIO
                    _assign(params, path + ("kernel",),
                            arr.transpose(2, 3, 1, 0))
                elif arr.ndim == 2 and is_linear:  # linear (out,in)->(in,out)
                    _assign(params, path + ("kernel",), arr.T)
                elif arr.ndim == 1:     # BN scale
                    _assign(params, path + ("scale",), arr)
                else:
                    skipped.append(k)
            elif leaf == "bias":
                _assign(params, path + ("bias",), arr)
            elif leaf == "running_mean":
                _assign(batch_stats, path + ("mean",), arr)
            elif leaf == "running_var":
                _assign(batch_stats, path + ("var",), arr)
            elif leaf == "num_batches_tracked":
                pass
            else:
                skipped.append(k)
    return params, batch_stats, skipped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("h5_path")
    ap.add_argument("out_dir")
    ap.add_argument("--backbone", default="resnet101")
    args = ap.parse_args()

    params, batch_stats, skipped = convert(args.h5_path, args.backbone)
    if skipped:
        print(f"skipped {len(skipped)} keys (non-parameter/buffers):")
        for k in skipped[:20]:
            print("  ", k)

    # validate against a freshly initialized model tree
    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.config import Config, ModelConfig
    from multiposenet_tpu.models.posenet import PoseNet

    cfg = Config(model=ModelConfig(backbone=args.backbone))
    model = PoseNet(cfg.model)
    ref = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17)),
        method=PoseNet.init_all)

    def compare(ref_tree, got_tree, prefix=""):
        problems = []
        for k, v in ref_tree.items():
            p = f"{prefix}/{k}"
            if isinstance(v, dict):
                problems += compare(v, got_tree.get(k, {}), p)
            else:
                g = got_tree.get(k)
                if g is None:
                    problems.append(f"missing {p} {v.shape}")
                elif tuple(g.shape) != tuple(v.shape):
                    problems.append(f"shape {p}: ckpt {g.shape} model {v.shape}")
        return problems

    probs = compare(ref["params"], params)
    probs += compare(ref.get("batch_stats", {}), batch_stats, "batch_stats")
    if probs:
        print(f"{len(probs)} mismatches vs model tree:")
        for p in probs[:40]:
            print("  ", p)
    else:
        print("parameter tree matches the model exactly")

    import orbax.checkpoint as ocp
    out = os.path.abspath(args.out_dir)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(out, {"params": params, "batch_stats": batch_stats})
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
