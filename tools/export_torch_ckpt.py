"""Export this framework's parameters BACK to the reference's h5 format.

Exact inverse of tools/convert_torch_ckpt.py: the Flax parameter /
batch-stats trees are flattened onto the reference poseNet's torch
state_dict key names (reference network/posenet.py:154-224, fpn.py:37-74),
conv kernels transposed HWIO -> OIHW, PRN linear kernels (in,out) ->
(out,in), BatchNorm scale -> weight / mean -> running_mean / var ->
running_var, and the result is written in the reference's own checkpoint
layout — one HDF5 dataset per state_dict key plus an ``epoch`` attribute
(reference network/net_utils.py:30-34).  ``num_batches_tracked`` (an int64
scalar in every torch BN state_dict that Flax has no analog for) is emitted
as 0 so the reference's ``load_net`` (net_utils.py:69-92) restores the file
without a single "No layer" / "Inconsistent shape" warning.

This is the migration escape hatch: a model trained in this framework can
be evaluated or fine-tuned with the original PyTorch code base.

Usage:
  python tools/export_torch_ckpt.py <orbax_ckpt_dir> out.h5 \
      [--backbone resnet101] [--epoch N]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Flax top-level module -> torch attribute prefix on poseNet
# (reference network/posenet.py:158-211: self.fpn / self.regressionModel /
# self.classificationModel / self.prn; the keypoint-head convs are direct
# attributes of poseNet itself, posenet.py:162-187, hence the empty prefix).
_TOP_PREFIX = {
    "fpn": "fpn",
    "keypoint_head": "",
    "regression_head": "regressionModel",
    "classification_head": "classificationModel",
    "prn": "prn",
}


def torch_key_from_path(path, leaf: str) -> str:
    """Flax module path tuple + torch leaf name -> reference state_dict key.

    Inverse of convert_torch_ckpt.torch_key_to_paths.
    """
    top = path[0]
    if top not in _TOP_PREFIX:
        raise KeyError(f"unknown top-level module {path}")
    if top == "fpn" and len(path) == 3:
        # fpn.layerX_N.(convY|bnY|downsample_conv|downsample_bn)
        m = re.match(r"layer(\d)_(\d+)$", path[1])
        if not m:
            raise KeyError(f"unrecognized fpn block {path}")
        mod = path[2]
        if mod == "downsample_conv":
            mod = "downsample.0"
        elif mod == "downsample_bn":
            mod = "downsample.1"
        return f"fpn.layer{m.group(1)}.{m.group(2)}.{mod}.{leaf}"
    prefix = _TOP_PREFIX[top]
    body = ".".join(path[1:])
    parts = [p for p in (prefix, body) if p]
    return ".".join(parts + [leaf])


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def export_state_dict(params: dict, batch_stats: dict) -> dict:
    """Flax {params, batch_stats} trees -> {torch state_dict key: ndarray}.

    Value transposes are the exact inverses of convert_torch_ckpt.convert:
    conv HWIO -> OIHW, PRN dense (in,out) -> (out,in), BN scale -> weight.
    """
    out: dict = {}
    for path, arr in _flatten(params):
        leaf = path[-1]
        mod_path = path[:-1]
        if leaf == "kernel":
            if arr.ndim == 4:
                out[torch_key_from_path(mod_path, "weight")] = (
                    arr.transpose(3, 2, 0, 1))
            elif arr.ndim == 2:
                out[torch_key_from_path(mod_path, "weight")] = arr.T
            else:
                raise ValueError(f"unexpected kernel rank {arr.shape} at {path}")
        elif leaf == "scale":
            out[torch_key_from_path(mod_path, "weight")] = arr
        elif leaf == "bias":
            out[torch_key_from_path(mod_path, "bias")] = arr
        else:
            raise ValueError(f"unexpected param leaf {leaf} at {path}")
    for path, arr in _flatten(batch_stats):
        leaf = path[-1]
        mod_path = path[:-1]
        if leaf == "mean":
            out[torch_key_from_path(mod_path, "running_mean")] = arr
        elif leaf == "var":
            out[torch_key_from_path(mod_path, "running_var")] = arr
            # torch BN state_dicts carry an int64 scalar step counter with
            # no Flax analog; 0 keeps load_net warning-free
            out[torch_key_from_path(mod_path, "num_batches_tracked")] = (
                np.asarray(0, np.int64))
        else:
            raise ValueError(f"unexpected batch_stats leaf {leaf} at {path}")
    return out


def write_reference_h5(state: dict, out_path: str, epoch: int = -1) -> None:
    """Write a state dict in the reference's checkpoint layout: one dataset
    per key, float params as float32, plus the ``epoch`` attr
    (reference network/net_utils.py:30-34)."""
    import h5py

    with h5py.File(out_path, mode="w") as h5f:
        for k, v in state.items():
            v = np.asarray(v)
            if v.dtype.kind == "f" and v.dtype != np.float32:
                v = v.astype(np.float32)
            h5f.create_dataset(k, data=v)
        h5f.attrs["epoch"] = epoch


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir", help="orbax checkpoint directory "
                    "({params, batch_stats} tree)")
    ap.add_argument("out_h5")
    ap.add_argument("--backbone", default="resnet101")
    ap.add_argument("--epoch", type=int, default=-1)
    args = ap.parse_args(argv)

    import jax
    import orbax.checkpoint as ocp

    # Restore raw HOST arrays with no sharding pinning: a checkpoint written
    # on any device topology (CPU mesh, TPU pod) must be exportable from any
    # process.  A bare StandardCheckpointer restore resurrects the saved
    # shardings and fails when the saving topology's devices don't exist
    # here, so spell out numpy restore_args from the tree metadata.
    path = os.path.abspath(args.ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path)
        for attr in ("item_metadata", "tree"):
            meta = getattr(meta, attr, meta)
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        tree = ckptr.restore(path, restore_args=restore_args)
    params = tree["params"]
    batch_stats = tree.get("batch_stats", {})
    state = export_state_dict(params, batch_stats)

    # topology sanity: resnet50 has 6 layer3 blocks, resnet101 has 23
    # (reference fpn.py:128-134)
    n_l3 = len({k.split(".")[2] for k in state if k.startswith("fpn.layer3.")})
    expect = {"resnet50": 6, "resnet101": 23}[args.backbone]
    if n_l3 != expect:
        raise SystemExit(
            f"checkpoint has {n_l3} fpn.layer3 blocks but --backbone "
            f"{args.backbone} expects {expect} — wrong --backbone?")

    # validate the key set against the expected reference topology by
    # round-tripping through the forward converter's key mapper
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "convert_torch_ckpt",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "convert_torch_ckpt.py"))
    conv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(conv)
    bad = [k for k in state
           if conv.torch_key_to_paths(k) is None
           and not k.endswith("num_batches_tracked")]
    if bad:
        print(f"WARNING: {len(bad)} exported keys unknown to the forward "
              f"converter: {bad[:10]}")

    write_reference_h5(state, args.out_h5, epoch=args.epoch)
    print(f"wrote {args.out_h5}: {len(state)} state_dict entries "
          f"(epoch={args.epoch})")


if __name__ == "__main__":
    main()
