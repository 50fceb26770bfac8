"""Numerics parity vs PyTorch for the layer semantics the backbone relies on.

torch (CPU) is a test-only dependency.  These tests build the STANDARD
torch layers (Conv2d/BatchNorm2d/MaxPool2d/Upsample — the same primitives
the reference composes), copy our Flax parameters into them, and compare
activations.  They pin down the easy-to-get-wrong conventions: 7x7/2 conv
padding, 3x3/2 maxpool with padding 1, BN eval-mode running stats, nearest
upsample indexing, and the bottleneck residual wiring.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from multiposenet_tpu.models.fpn import Bottleneck, upsample_nearest  # noqa: E402


def _to_torch_conv(conv, kernel, bias=None):
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.asarray(kernel).transpose(3, 2, 0, 1)))
        if bias is not None:
            conv.bias.copy_(torch.from_numpy(np.asarray(bias)))
    return conv


def _to_torch_bn(bn, scale, b, mean, var):
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(scale)))
        bn.bias.copy_(torch.from_numpy(np.asarray(b)))
        bn.running_mean.copy_(torch.from_numpy(np.asarray(mean)))
        bn.running_var.copy_(torch.from_numpy(np.asarray(var)))
    bn.eval()
    return bn


def test_stem_conv_maxpool_matches_torch(rng):
    """7x7/2 pad3 conv + BN(eval) + relu + 3x3/2 pad1 maxpool."""
    from flax import linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                        use_bias=False, name="conv1")(x)
            x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, name="bn1")(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])

    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    m = Stem()
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize batch stats so eval-mode BN is actually tested
    variables = jax.tree.map(lambda a: a, variables)
    stats = {
        "mean": rng.randn(8).astype(np.float32) * 0.1,
        "var": rng.rand(8).astype(np.float32) + 0.5,
    }
    variables = {
        "params": variables["params"],
        "batch_stats": {"bn1": {"mean": jnp.asarray(stats["mean"]),
                                "var": jnp.asarray(stats["var"])}},
    }
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))

    conv = _to_torch_conv(torch.nn.Conv2d(3, 8, 7, 2, 3, bias=False),
                          variables["params"]["conv1"]["kernel"])
    bn = _to_torch_bn(torch.nn.BatchNorm2d(8),
                      variables["params"]["bn1"]["scale"],
                      variables["params"]["bn1"]["bias"],
                      stats["mean"], stats["var"])
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t = torch.relu(bn(conv(t)))
        t = torch.nn.functional.max_pool2d(t, 3, 2, 1)
    theirs = t.numpy().transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_bottleneck_matches_torch(rng):
    """Full bottleneck with stride-2 downsample path."""
    x = rng.rand(1, 16, 16, 8).astype(np.float32)
    blk = Bottleneck(planes=4, stride=2)
    variables = blk.init(jax.random.PRNGKey(1), jnp.asarray(x), False)
    p = variables["params"]
    bs = variables["batch_stats"]
    ours = np.asarray(blk.apply(variables, jnp.asarray(x), False))

    class TorchBottleneck(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(8, 4, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(4)
            self.conv2 = torch.nn.Conv2d(4, 4, 3, 2, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(4)
            self.conv3 = torch.nn.Conv2d(4, 16, 1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(16)
            self.dconv = torch.nn.Conv2d(8, 16, 1, 2, bias=False)
            self.dbn = torch.nn.BatchNorm2d(16)

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            out = out + self.dbn(self.dconv(x))
            return torch.relu(out)

    tb = TorchBottleneck()
    for name, conv in [("conv1", tb.conv1), ("conv2", tb.conv2),
                       ("conv3", tb.conv3), ("downsample_conv", tb.dconv)]:
        _to_torch_conv(conv, p[name]["kernel"])
    for name, bn in [("bn1", tb.bn1), ("bn2", tb.bn2), ("bn3", tb.bn3),
                     ("downsample_bn", tb.dbn)]:
        _to_torch_bn(bn, p[name]["scale"], p[name]["bias"],
                     bs[name]["mean"], bs[name]["var"])
    tb.eval()
    with torch.no_grad():
        theirs = tb(torch.from_numpy(x.transpose(0, 3, 1, 2))
                    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_nearest_upsample_matches_torch(rng):
    x = rng.rand(1, 5, 7, 3).astype(np.float32)
    for k in (2, 4, 8):
        ours = np.asarray(upsample_nearest(jnp.asarray(x), (5 * k, 7 * k)))
        with torch.no_grad():
            theirs = torch.nn.functional.interpolate(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=k,
                mode="nearest").numpy().transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(ours, theirs)
