"""PoseNet — the composite three-subnet model (reference network/posenet.py:154-350).

One Flax module owning the ResNet-FPN trunk and the three subnet heads.
Instead of the reference's runtime string dispatch on `(img, subnet_name)`
tuples (posenet.py:226-234), each subnet has its own apply method — each
train/eval step jits exactly the graph it needs.

The full inference pipeline (backbone -> both heads -> anchor decode -> NMS
-> peaks) is assembled as a pure jitted function in
`multiposenet_tpu/engine/inference.py` so the model stays a pure network.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multiposenet_tpu.config import ModelConfig
from multiposenet_tpu.models.fpn import ResNetFPN
from multiposenet_tpu.models.subnets import (
    ClassificationHead,
    KeypointHead,
    PRN,
    RegressionHead,
)

BLOCK_COUNTS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


class PoseNet(nn.Module):
    cfg: ModelConfig = ModelConfig()

    def setup(self):
        c = self.cfg
        self.fpn = ResNetFPN(block_counts=BLOCK_COUNTS[c.backbone],
                             channels=c.fpn_channels,
                             compute_dtype=c.compute_dtype,
                             fold_bn=c.fold_bn, name="fpn")
        self.keypoint_head = KeypointHead(
            num_joints=c.num_joints, interm_channels=c.num_interm_channels,
            mid_channels=c.keypoint_mid_channels,
            compute_dtype=c.compute_dtype, name="keypoint_head")
        self.regression_head = RegressionHead(
            num_anchors=c.num_anchors, feature_size=c.fpn_channels,
            compute_dtype=c.compute_dtype, name="regression_head")
        self.classification_head = ClassificationHead(
            num_anchors=c.num_anchors, num_classes=c.num_classes,
            prior=c.prior, feature_size=c.fpn_channels,
            compute_dtype=c.compute_dtype, name="classification_head")
        self.prn = PRN(node_count=c.prn_node_count, coeff=c.prn_coeff,
                       dropout=c.prn_dropout, compute_dtype=c.compute_dtype,
                       name="prn")

    # ---- per-subnet forwards --------------------------------------------

    def keypoint_forward(self, img: jnp.ndarray, train: bool = False
                         ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """(B,H,W,3) -> final heatmaps + 5 saved_for_loss tensors
        (reference posenet.py:288-318)."""
        feats = self.fpn(img, train=train)
        return self.keypoint_head(feats.keypoint)

    def detection_forward(self, img: jnp.ndarray, train: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B,H,W,3) -> (classification (B,A,C), regression (B,A,4)).

        BatchNorm always uses running stats in this stage — the reference
        freezes BN outside the keypoint stage (trainer.py:172-174).
        """
        feats = self.fpn(img, train=False)
        reg = jnp.concatenate(
            [self.regression_head(f) for f in feats.detection], axis=1)
        cls = jnp.concatenate(
            [self.classification_head(f) for f in feats.detection], axis=1)
        return cls, reg

    def prn_forward(self, grid: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, 28*coeff, 18*coeff, 17) -> same-shaped softmax grid
        (reference posenet.py:337-350)."""
        return self.prn(grid, train=train)

    def full_forward(self, img: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Shared-backbone inference: heatmaps + raw detection outputs
        (reference posenet.py:236-263; decode/NMS happen in engine/inference).
        """
        feats = self.fpn(img, train=False)
        predict_keypoint, _ = self.keypoint_head(feats.keypoint)
        reg = jnp.concatenate(
            [self.regression_head(f) for f in feats.detection], axis=1)
        cls = jnp.concatenate(
            [self.classification_head(f) for f in feats.detection], axis=1)
        return predict_keypoint, cls, reg

    def init_all(self, img: jnp.ndarray, prn_grid: jnp.ndarray):
        """Trace every subnet once so `model.init(..., method=PoseNet.init_all)`
        creates the complete parameter tree (fpn + all heads + prn)."""
        out = self.full_forward(img)  # fpn + keypoint head (incl. interm) + det heads
        prn = self.prn_forward(prn_grid)
        return out, prn

    def __call__(self, img: jnp.ndarray):
        return self.full_forward(img)
