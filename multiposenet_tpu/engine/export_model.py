"""AOT serving artifacts: the fused pose pipeline as serialized StableHLO.

The reference has no deployment artifact — serving it means shipping the
whole training codebase (demo drivers import the full network + torch
checkpoint machinery, reference evaluate/multipose_test.py,
evaluate/tester.py:195-254).  The TPU-native deployment unit is a
`jax.export` module: the ENTIRE e2e pose graph (preprocess -> FPN forward
-> decode -> NMS -> peaks -> PRN -> grouping) lowered once to StableHLO
with the trained weights baked in as constants, serialized to one file.
At serving time `load_pose_pipeline` needs NO model code, NO config tree
and NO checkpoint layout — just jax on the target (TPU or CPU; the
artifact is lowered for both platforms by default).

Two deliberate choices:

- Weights are CLOSED OVER, not call arguments: the artifact is
  self-contained and version-pinned (a serving fleet cannot pair the
  wrong checkpoint with the wrong graph).
- The portable XLA NMS path is pinned (`use_pallas_nms=False`) so one
  artifact runs on every platform it was lowered for.  This is
  AP-lossless: the gate's ablation matrix measures the Pallas and XLA
  NMS paths protocol-IDENTICAL (dAP exactly 0, docs/PERF.md
  "AP-evidence ablation matrix").

Round-trip equivalence against the live pipeline is pinned in
tests/test_export_stablehlo.py.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence, Union

import jax
import jax.numpy as jnp

from multiposenet_tpu.config import Config
from multiposenet_tpu.engine.inference import (
    PoseAssignments,
    make_e2e_pose_pipeline,
)
from multiposenet_tpu.models.posenet import PoseNet

def export_pose_pipeline(model: PoseNet, cfg: Config, params,
                         batch: int,
                         platforms: Sequence[str] = ("tpu", "cpu")) -> bytes:
    """Lower the fused e2e pose pipeline to serialized StableHLO bytes.

    `params` (the full variables tree incl. BN stats) is baked into the
    module as constants.  Input signature of the exported function:
    `(images uint8[batch, inp, inp, 3], scales float32[batch])` with
    `inp = cfg.eval.inp_size`; output is the 8-array PoseAssignments
    tuple (engine/inference.py) in original-image coordinates —
    everything `format_pose_batch` needs to emit the reference's
    prn_result rows (tester.py:195-254).

    Artifact size is the weight volume and nothing else (resnet50
    PoseNet f32: 453.7 MB = its 113.4 M params/stats; constants are
    shared across the platform lowerings, so multi-platform is free).
    """
    cfg = dataclasses.replace(
        cfg, detection=dataclasses.replace(cfg.detection,
                                           use_pallas_nms=False))
    inp = cfg.eval.inp_size
    pipe = make_e2e_pose_pipeline(model, cfg, (inp, inp))

    def serve(images, scales):
        _, assigns = pipe.__wrapped__(params, images, scales)
        # plain tuple: the loader re-wraps into PoseAssignments, so the
        # artifact does not depend on this package's pytree registrations
        return tuple(assigns)

    exp = jax.export.export(jax.jit(serve), platforms=list(platforms))(
        jax.ShapeDtypeStruct((batch, inp, inp, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch,), jnp.float32))
    return exp.serialize()


class ServingPipeline:
    """A deserialized pose-pipeline artifact: `(images, scales) ->
    PoseAssignments`.  Batch size and input resolution are recovered from
    the module's own input signature — no side-channel config."""

    def __init__(self, exported: "jax.export.Exported"):
        self._exported = exported
        img_aval = exported.in_avals[0]
        self.batch = int(img_aval.shape[0])
        self.inp_size = int(img_aval.shape[1])
        self.platforms = tuple(exported.platforms)
        # eager Exported.call rebuilds its wrapper per invocation; jit it
        # once so steady-state serving pays only the dispatch
        self._call = jax.jit(exported.call)

    def __call__(self, images, scales) -> PoseAssignments:
        return PoseAssignments(*self._call(images, scales))


def load_pose_pipeline(src: Union[str, bytes, os.PathLike]) -> ServingPipeline:
    """`src` is a path to (or the bytes of) an `export_pose_pipeline`
    artifact."""
    if isinstance(src, (str, os.PathLike)):
        with open(src, "rb") as f:
            src = f.read()
    return ServingPipeline(jax.export.deserialize(src))
