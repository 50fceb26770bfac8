"""Convert torchvision ResNet-50/101 ImageNet weights (.pth) into this
framework's FPN backbone parameters.

Replaces the reference's stage-1 init `model.fpn.load_state_dict(model_zoo
...)` (reference training/multipose_keypoint_train.py:73-75).  Input is a
locally downloaded torchvision checkpoint (resnet101-5d3b4d8f.pth etc.);
torch (CPU) is only used to unpickle it.

Usage:
  python tools/convert_torchvision_resnet.py resnet101.pth out_dir
Then:
  python -m multiposenet_tpu.cli train --subnet keypoint --init-params out_dir
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _assign(tree, path, value):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = value


def tv_key_to_paths(key: str):
    """torchvision resnet state_dict key -> (path, leaf) under fpn/."""
    parts = key.split(".")
    if parts[0] in ("fc",):  # classifier head: not used
        return None
    if parts[0] in ("conv1", "bn1"):
        return ("fpn", parts[0]), parts[1]
    m = re.match(r"layer(\d)", parts[0])
    if m:
        block = f"layer{m.group(1)}_{parts[1]}"
        mod = parts[2]
        if mod == "downsample":
            mod = "downsample_conv" if parts[3] == "0" else "downsample_bn"
            leaf = parts[4]
        else:
            leaf = parts[3]
        return ("fpn", block, mod), leaf
    return None


def convert(state_dict):
    params, batch_stats, skipped = {}, {}, []
    for k, v in state_dict.items():
        arr = np.asarray(v)
        mapped = tv_key_to_paths(k)
        if mapped is None:
            skipped.append(k)
            continue
        path, leaf = mapped
        if leaf == "weight":
            if arr.ndim == 4:
                _assign(params, path + ("kernel",), arr.transpose(2, 3, 1, 0))
            else:
                _assign(params, path + ("scale",), arr)
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
    ap.add_argument("pth_path")
    ap.add_argument("out_dir")
    args = ap.parse_args()

    import torch
    sd = torch.load(args.pth_path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    params, batch_stats, skipped = convert(sd)
    print(f"converted {sum(1 for _ in _walk(params))} param leaves, "
          f"skipped {len(skipped)} (fc head etc.)")

    import orbax.checkpoint as ocp
    out = os.path.abspath(args.out_dir)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(out, {"params": params, "batch_stats": batch_stats})
    print(f"wrote {out}")


def _walk(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _walk(v)
        else:
            yield v


if __name__ == "__main__":
    main()
