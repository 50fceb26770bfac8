"""The reverse checkpoint exporter (tools/export_torch_ckpt.py).

Two layers of proof:

1. Pure round-trip: a randomly initialized Flax tree exported to the
   reference h5 layout and pulled back through the FORWARD converter
   (tools/convert_torch_ckpt.py) must reproduce the original tree exactly
   (both directions are pure transposes).

2. Reference oracle: a real reference poseNet's state_dict, taken through
   reference save_net -> our converter -> our exporter, must load back into
   a FRESH reference poseNet via the reference's own ``load_net``
   (reference network/net_utils.py:69-92) and leave its state_dict
   bit-identical to the original net's — proving every key name, shape,
   and transpose is exactly what the PyTorch code base expects.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")
h5py = pytest.importorskip("h5py")

from reference_oracle import (  # noqa: E402
    build_reference_posenet,
    import_reference_net_utils,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO_ROOT, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tools():
    return _load_tool("convert_torch_ckpt"), _load_tool("export_torch_ckpt")


def _tree_equal(a, b, prefix=""):
    assert set(a) == set(b), (
        f"{prefix}: keys {sorted(set(a) ^ set(b))[:8]} differ")
    for k in a:
        p = f"{prefix}/{k}"
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], p)
        else:
            x, y = np.asarray(a[k]), np.asarray(b[k])
            assert x.shape == y.shape, f"{p}: {x.shape} vs {y.shape}"
            assert np.array_equal(x, y), f"{p}: values differ"


def _init_flax_tree(backbone="resnet50"):
    import jax
    import jax.numpy as jnp

    from multiposenet_tpu.config import Config, ModelConfig
    from multiposenet_tpu.models.posenet import PoseNet

    cfg = Config(model=ModelConfig(backbone=backbone))
    model = PoseNet(cfg.model)
    return model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17)),
        method=PoseNet.init_all)


def test_flax_roundtrip_exact(tools, tmp_path):
    """flax init -> export h5 -> forward converter -> identical trees."""
    conv, exp = tools
    variables = _init_flax_tree()
    params = {k: v for k, v in variables["params"].items()}
    batch_stats = {k: v for k, v in variables["batch_stats"].items()}

    state = exp.export_state_dict(params, batch_stats)
    h5_path = str(tmp_path / "exported.h5")
    exp.write_reference_h5(state, h5_path, epoch=11)

    params2, batch_stats2, skipped = conv.convert(h5_path, backbone="resnet50")
    assert skipped == [], f"forward converter rejected keys: {skipped[:8]}"
    _tree_equal(params, params2, "params")
    _tree_equal(batch_stats, batch_stats2, "batch_stats")
    with h5py.File(h5_path, "r") as f:
        assert f.attrs["epoch"] == 11


def test_reference_loads_export_bit_exact(tools, tmp_path):
    """reference net -> save_net -> convert -> export -> load_net into a
    fresh reference net: state_dicts bit-identical, no key dropped."""
    conv, exp = tools
    net_utils = import_reference_net_utils()
    net = build_reference_posenet(layers=50, seed=5)

    ref_h5 = str(tmp_path / "ref.h5")
    net_utils.save_net(ref_h5, net, epoch=3)
    params, batch_stats, skipped = conv.convert(ref_h5, backbone="resnet50")
    assert skipped == []

    out_h5 = str(tmp_path / "export.h5")
    state = exp.export_state_dict(params, batch_stats)
    exp.write_reference_h5(state, out_h5, epoch=3)

    # exact key-set parity with the reference's own state_dict
    ref_keys = set(net.state_dict().keys())
    assert set(state.keys()) == ref_keys, (
        f"key sets differ: {sorted(ref_keys ^ set(state.keys()))[:8]}")

    # the reference's own loader restores it into a DIFFERENTLY seeded net
    net2 = build_reference_posenet(layers=50, seed=6)
    epoch, _ = net_utils.load_net(out_h5, net2, load_state_dict=True)
    assert epoch == 3

    sd, sd2 = net.state_dict(), net2.state_dict()
    for k in sd:
        a, b = sd[k].numpy(), sd2[k].numpy()
        if k.endswith("num_batches_tracked"):
            continue  # exporter pins the untracked step counter to 0
        assert a.shape == b.shape, f"{k}: {a.shape} vs {b.shape}"
        assert np.array_equal(a, b), (
            f"{k}: restored values differ (max "
            f"{np.abs(a.astype(np.float64) - b.astype(np.float64)).max():.3e})")


def test_cli_export_torch_roundtrip(tools, tmp_path):
    """`cli export-torch` on a real orbax ckpt produces an h5 the forward
    converter accepts and that reproduces the tree exactly."""
    import orbax.checkpoint as ocp

    from multiposenet_tpu.cli import main

    conv, _ = tools
    variables = _init_flax_tree()
    ckpt_dir = str(tmp_path / "ckpt")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, {"params": dict(variables["params"]),
                              "batch_stats": dict(variables["batch_stats"])})

    out_h5 = str(tmp_path / "cli_export.h5")
    main(["export-torch", ckpt_dir, out_h5,
          "--backbone", "resnet50", "--epoch", "4"])

    params2, batch_stats2, skipped = conv.convert(out_h5, backbone="resnet50")
    assert skipped == []
    _tree_equal(dict(variables["params"]), params2, "params")
    _tree_equal(dict(variables["batch_stats"]), batch_stats2, "batch_stats")
    with h5py.File(out_h5, "r") as f:
        assert f.attrs["epoch"] == 4


def test_torch_key_inverse_bijection(tools):
    """torch_key_from_path is a left inverse of torch_key_to_paths on every
    key the real model emits."""
    conv, exp = tools
    net = build_reference_posenet(layers=50, seed=5)
    for k in net.state_dict().keys():
        mapped = conv.torch_key_to_paths(k)
        if mapped is None:
            assert k.split(".")[-1] != "weight" or True
            continue
        path, leaf = mapped
        if leaf == "num_batches_tracked":
            continue
        # converter renames leaves during assignment; reproduce that here
        if leaf == "weight":
            back = exp.torch_key_from_path(path, "weight")
        elif leaf in ("bias", "running_mean", "running_var"):
            back = exp.torch_key_from_path(path, leaf)
        else:
            continue
        assert back == k.replace("module.", ""), f"{k} -> {path} -> {back}"
