"""Subnet heads: keypoint estimation, RetinaNet detection heads, PRN.

Mirrors reference network/posenet.py:33-152,162-197 with NHWC layout and
channel-concat orders preserved (p5,p4,p3,p2 — posenet.py:257).
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multiposenet_tpu.models.fpn import conv_init, upsample_nearest


class KeypointHead(nn.Module):
    """Keypoint subnet (reference posenet.py:162-187, 288-318).

    Per FPN level l in (2..5): 3x3 conv 256->128 (`convt`) + 3x3 conv
    128->128 (`convs`); upsample to stride 4; concat (p5,p4,p3,p2) -> 512ch;
    3x3 conv -> 256; relu; 1x1 conv -> num_joints heatmaps.  Intermediate
    supervision: per-level 1x1 conv -> interm_channels upsampled to stride 4.
    """

    num_joints: int = 18
    interm_channels: int = 19
    mid_channels: int = 128
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        fp2, fp3, fp4, fp5 = feats
        dtype = self.compute_dtype
        target_hw = fp2.shape[1:3]

        def conv(f, k, name):
            return nn.Conv(f, (k, k), padding=[(k // 2, k // 2)] * 2,
                           kernel_init=conv_init, dtype=dtype, name=name)

        # intermediate supervision heads, all brought to stride 4
        # (reference posenet.py:296-299)
        saved = [
            conv(self.interm_channels, 1, "convfin_k2")(fp2),
            upsample_nearest(conv(self.interm_channels, 1, "convfin_k3")(fp3), target_hw),
            upsample_nearest(conv(self.interm_channels, 1, "convfin_k4")(fp4), target_hw),
            upsample_nearest(conv(self.interm_channels, 1, "convfin_k5")(fp5), target_hw),
        ]

        # main branch: convt_l + convs_l per level, upsample, concat deepest-first
        m = self.mid_channels
        p5 = conv(m, 3, "convs1")(conv(m, 3, "convt1")(fp5))
        p4 = conv(m, 3, "convs2")(conv(m, 3, "convt2")(fp4))
        p3 = conv(m, 3, "convs3")(conv(m, 3, "convt3")(fp3))
        p2 = conv(m, 3, "convs4")(conv(m, 3, "convt4")(fp2))

        cat = jnp.concatenate(
            [upsample_nearest(p5, target_hw),
             upsample_nearest(p4, target_hw),
             upsample_nearest(p3, target_hw),
             p2],
            axis=-1,
        )
        out = nn.relu(conv(256, 3, "conv2")(cat))
        predict = conv(self.num_joints, 1, "convfin")(out)
        saved.append(predict)
        return predict, saved


class RegressionHead(nn.Module):
    """RetinaNet box regression trunk, shared across levels
    (reference posenet.py:33-69)."""

    num_anchors: int = 9
    feature_size: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = self.compute_dtype
        for i in range(1, 5):
            x = nn.relu(nn.Conv(self.feature_size, (3, 3), padding=1,
                                kernel_init=conv_init, dtype=dtype,
                                name=f"conv{i}")(x))
        # output conv initialized to zero weights AND zero bias
        # (reference posenet.py:208-209)
        out = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                      kernel_init=nn.initializers.zeros, dtype=dtype,
                      name="output")(x)
        b = out.shape[0]
        return out.reshape(b, -1, 4)


class ClassificationHead(nn.Module):
    """RetinaNet classification trunk with sigmoid + focal prior bias
    (reference posenet.py:72-117, bias init posenet.py:205-207)."""

    num_anchors: int = 9
    num_classes: int = 1
    prior: float = 0.01
    feature_size: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = self.compute_dtype
        for i in range(1, 5):
            x = nn.relu(nn.Conv(self.feature_size, (3, 3), padding=1,
                                kernel_init=conv_init, dtype=dtype,
                                name=f"conv{i}")(x))
        bias_init = nn.initializers.constant(
            -math.log((1.0 - self.prior) / self.prior))
        out = nn.Conv(self.num_anchors * self.num_classes, (3, 3), padding=1,
                      kernel_init=nn.initializers.zeros, bias_init=bias_init,
                      dtype=dtype, name="output")(x)
        out = nn.sigmoid(out)
        b = out.shape[0]
        return out.reshape(b, -1, self.num_classes)


class PRN(nn.Module):
    """Pose Residual Network (reference posenet.py:130-152).

    Residual MLP over a flattened (H, W, 17) keypoint-gaussian crop with a
    softmax over the WHOLE flattened vector.  The softmax/residual structure
    is kept exactly; the two hidden matmuls are MXU-shaped (1024x1024).
    """

    node_count: int = 1024
    coeff: int = 2
    dropout: float = 0.5
    compute_dtype: Any = jnp.float32

    @property
    def height(self) -> int:
        return 28 * self.coeff

    @property
    def width(self) -> int:
        return 18 * self.coeff

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b = x.shape[0]
        dtype = self.compute_dtype
        res = x.reshape(b, -1).astype(dtype)
        d = res.shape[-1]  # height * width * 17

        out = nn.relu(nn.Dense(self.node_count, dtype=dtype, name="dens1")(res))
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.relu(nn.Dense(self.node_count, dtype=dtype, name="bneck")(out))
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.relu(nn.Dense(d, dtype=dtype, name="dens2")(out))
        out = out + res
        # the 34k-way whole-vector softmax is numerically sensitive: pin it
        # UP to float32 under bf16 compute without downcasting float64
        # (the oracle's strict f64 gradient-identity tests run through here)
        out = nn.softmax(out.astype(jnp.promote_types(out.dtype, jnp.float32)),
                         axis=1)
        return out.reshape(b, self.height, self.width, 17)
