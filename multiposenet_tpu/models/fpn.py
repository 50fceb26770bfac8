"""ResNet-50/101 backbone + dual-head FPN — Flax linen, NHWC.

Rebuilds the behavior of reference network/fpn.py:37-134: one bottom-up
ResNet trunk feeding TWO independent FPN top-downs — a detection pyramid
P3..P7 (RetinaNet) and a keypoint pyramid P2..P5 — with nearest-neighbor
upsample-add merges (reference fpn.py:84-95).

TPU-first choices:
- NHWC layout throughout (channels-last is the native TPU conv layout).
- Nearest x2 upsampling is `jnp.repeat` (exact, layout-preserving, fuses
  into the surrounding elementwise adds) rather than a gather-based resize.
- Activations can run in bfloat16 (`compute_dtype`); parameters and batch
  statistics stay float32.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# conv kernels are initialized N(0, 0.01) like the reference
# (posenet.py:213-218 applies it to every nn.Conv2d in the tree)
conv_init = nn.initializers.normal(stddev=0.01)


class FPNFeatures(NamedTuple):
    keypoint: Tuple[jnp.ndarray, ...]   # (fp2, fp3, fp4, fp5) strides 4..32
    detection: Tuple[jnp.ndarray, ...]  # (p3, p4, p5, p6, p7) strides 8..128


def upsample_nearest(x: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor upsample to a target (H, W).

    For integer ratios this is an exact `repeat` (identical to torch
    F.upsample(mode='nearest'): out[i] = in[i // k]).
    """
    h, w = x.shape[1], x.shape[2]
    th, tw = target_hw
    if th == h and tw == w:
        return x
    if th % h == 0 and tw % w == 0:
        return jnp.repeat(jnp.repeat(x, th // h, axis=1), tw // w, axis=2)
    return jax.image.resize(x, (x.shape[0], th, tw, x.shape[3]), method="nearest")


class Bottleneck(nn.Module):
    """ResNet bottleneck block (reference fpn.py:9-34); expansion 4."""

    planes: int
    stride: int = 1
    compute_dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = self.compute_dtype
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=self.fold_bn, kernel_init=conv_init, dtype=dtype,
            name=name)
        if self.fold_bn:
            # inference-only graph: the BN affine lives in the conv
            # weights/bias (models/fold_bn.fold_bn_variables)
            assert not train, "fold_bn is an inference-only graph"
            bn = lambda name: (lambda x: x)  # noqa: E731
        else:
            bn = lambda name: nn.BatchNorm(  # noqa: E731
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=dtype, name=name)

        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, self.stride, "conv2")(out)))
        out = bn("bn3")(conv(self.planes * 4, 1, 1, "conv3")(out))

        if self.stride != 1 or x.shape[-1] != self.planes * 4:
            x = bn("downsample_bn")(
                conv(self.planes * 4, 1, self.stride, "downsample_conv")(x))
        return nn.relu(out + x)


class ResNetFPN(nn.Module):
    """ResNet trunk + dual FPN heads.

    block_counts: (3,4,6,3) for resnet50, (3,4,23,3) for resnet101
    (reference fpn.py:128-134).
    """

    block_counts: Sequence[int] = (3, 4, 23, 3)
    channels: int = 256
    compute_dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> FPNFeatures:
        dtype = self.compute_dtype
        x = x.astype(dtype)

        def conv(f, k, s, name, use_bias=True):
            return nn.Conv(f, (k, k), strides=(s, s),
                           padding=[(k // 2, k // 2)] * 2, use_bias=use_bias,
                           kernel_init=conv_init, dtype=dtype, name=name)

        # stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool (reference fpn.py:41-42,99-100)
        c1 = conv(64, 7, 2, "conv1", use_bias=self.fold_bn)(x)
        if self.fold_bn:
            assert not train, "fold_bn is an inference-only graph"
        else:
            c1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=dtype, name="bn1")(c1)
        c1 = nn.relu(c1)
        c1 = nn.max_pool(c1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # bottom-up stages
        def stage(h, planes, blocks, stride, name):
            for i in range(blocks):
                h = Bottleneck(planes, stride if i == 0 else 1, dtype,
                               fold_bn=self.fold_bn,
                               name=f"{name}_{i}")(h, train)
            return h

        c2 = stage(c1, 64, self.block_counts[0], 1, "layer1")    # stride 4
        c3 = stage(c2, 128, self.block_counts[1], 2, "layer2")   # stride 8
        c4 = stage(c3, 256, self.block_counts[2], 2, "layer3")   # stride 16
        c5 = stage(c4, 512, self.block_counts[3], 2, "layer4")   # stride 32

        ch = self.channels

        # ---- detection pyramid (reference fpn.py:103-112) ----
        p6 = conv(ch, 3, 2, "conv6")(c5)
        p7 = conv(ch, 3, 2, "conv7")(nn.relu(p6))
        p5 = conv(ch, 1, 1, "latlayer1")(c5)
        p4 = upsample_nearest(p5, c4.shape[1:3]) + conv(ch, 1, 1, "latlayer2")(c4)
        p3 = upsample_nearest(p4, c3.shape[1:3]) + conv(ch, 1, 1, "latlayer3")(c3)
        p5 = conv(ch, 3, 1, "toplayer0")(p5)
        p4 = conv(ch, 3, 1, "toplayer1")(p4)
        p3 = conv(ch, 3, 1, "toplayer2")(p3)

        # ---- keypoint pyramid (reference fpn.py:114-122) ----
        fp5 = conv(ch, 1, 1, "toplayer")(c5)
        fp4 = upsample_nearest(fp5, c4.shape[1:3]) + conv(ch, 1, 1, "flatlayer1")(c4)
        fp3 = upsample_nearest(fp4, c3.shape[1:3]) + conv(ch, 1, 1, "flatlayer2")(c3)
        fp2 = upsample_nearest(fp3, c2.shape[1:3]) + conv(ch, 1, 1, "flatlayer3")(c2)
        fp4 = conv(ch, 3, 1, "smooth1")(fp4)
        fp3 = conv(ch, 3, 1, "smooth2")(fp3)
        fp2 = conv(ch, 3, 1, "smooth3")(fp2)

        return FPNFeatures(keypoint=(fp2, fp3, fp4, fp5),
                           detection=(p3, p4, p5, p6, p7))
