"""BatchPredictor — serving-oriented batched inference front-end.

The reference's inference surface is per-image scripts (evaluate/
multipose_test.py); for production serving the unit of work on TPU is a
fixed-shape batch.  BatchPredictor:

- pads/letterboxes arbitrary images to the model's square input on host
  (same pad-to-square + resize as reference tester.py:201-208),
- packs them into fixed-capacity batches (padding ragged tails with zeros),
- runs the ENTIRE pose pipeline — forward, NMS, peaks, PRN, grouping —
  as one jitted dispatch per batch (engine/inference.make_e2e_pose_pipeline);
  only dict formatting stays on host,
- unpacks per-image person results in original-image coordinates.

Pass a `jax.sharding.Mesh` to shard each batch over its devices (params
replicated, batch axis split — zero collectives in the forward), so one
predictor saturates a whole slice.  H2D of the next batch overlaps device
compute via async dispatch.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from multiposenet_tpu.config import Config
from multiposenet_tpu.engine.inference import (
    format_pose_batch,
    make_e2e_pose_pipeline,
    make_sharded_e2e_pipeline,
)
from multiposenet_tpu.models.posenet import PoseNet


class BatchPredictor:
    def __init__(self, cfg: Config, model: Optional[PoseNet] = None,
                 params=None, batch_size: int = 8, mesh=None):
        self.cfg = cfg
        self.batch_size = batch_size
        self.model = model or PoseNet(cfg.model)
        self.params = params
        self.inp = cfg.eval.inp_size
        self.mesh = mesh
        if mesh is not None:
            n_dev = mesh.devices.size
            if batch_size % n_dev != 0:
                raise ValueError(
                    f"batch_size {batch_size} must be divisible by the mesh "
                    f"device count {n_dev} (batch-axis sharding)")
            self._pipeline = make_sharded_e2e_pipeline(
                self.model, cfg, (self.inp, self.inp), mesh)
        else:
            self._pipeline = make_e2e_pose_pipeline(
                self.model, cfg, (self.inp, self.inp))

    @classmethod
    def from_exported(cls, src) -> "BatchPredictor":
        """Serve from a serialized StableHLO artifact
        (engine/export_model.py) — weights are baked into the module, so
        no model code, params tree or config is needed; batch size and
        input resolution come from the artifact's own input signature."""
        from multiposenet_tpu.engine.export_model import load_pose_pipeline

        sp = load_pose_pipeline(src)
        # no config/model/params exist on this path (the artifact replaces
        # them); leave those attributes None so anything that would need
        # them fails loudly instead of reading stale defaults
        self = cls.__new__(cls)
        self.cfg = None
        self.batch_size = sp.batch
        self.model = None
        self.params = None
        self.inp = sp.inp_size
        self.mesh = None
        self._pipeline = lambda _params, images, scales: (
            None, sp(images, scales))
        return self

    # -- host-side packing ------------------------------------------------

    def _pack(self, img_bgr: np.ndarray) -> Tuple[np.ndarray, float]:
        inp = self.inp
        shape_dst = int(np.max(img_bgr.shape[:2]))
        scale = float(shape_dst) / inp
        pad = abs(img_bgr.shape[1] - img_bgr.shape[0])
        sq = np.pad(img_bgr, ([0, pad], [0, pad], [0, 0]),
                    "constant")[:shape_dst, :shape_dst]
        rgb = cv2.resize(sq, (inp, inp))[:, :, ::-1]
        return rgb.astype(np.uint8), scale

    # -- public API --------------------------------------------------------

    def _finish_chunk(self, assigns, n_real: int) -> List[List[Dict]]:
        """Fetch one dispatched chunk (single batched device_get) and run
        the host formatting tail per image."""
        assigns = jax.device_get(assigns)
        return format_pose_batch(assigns)[:n_real]

    def predict(self, images_bgr: Sequence[np.ndarray]) -> List[List[Dict]]:
        """BGR images (any sizes) -> per-image person result lists.

        Chunks are dispatched 2 deep: the device runs chunk k+1's pipeline
        while the host formats chunk k (jax dispatch is async)."""
        results: List[List[Dict]] = []
        pending = []
        for lo in range(0, len(images_bgr), self.batch_size):
            chunk = images_bgr[lo: lo + self.batch_size]
            packed = [self._pack(im) for im in chunk]
            batch = np.zeros((self.batch_size, self.inp, self.inp, 3),
                             np.uint8)
            scales = np.ones(self.batch_size, np.float32)
            for i, (rgb, scale) in enumerate(packed):
                batch[i] = rgb
                scales[i] = scale
            _, assigns = self._pipeline(
                self.params, jnp.asarray(batch), jnp.asarray(scales))
            pending.append((assigns, len(packed)))
            if len(pending) > 2:
                results.extend(self._finish_chunk(*pending.pop(0)))
        for assigns, n_real in pending:
            results.extend(self._finish_chunk(assigns, n_real))
        return results

    def predict_stream(self, images: Iterable[np.ndarray]
                       ) -> Iterable[List[Dict]]:
        buf: List[np.ndarray] = []
        for im in images:
            buf.append(im)
            if len(buf) == self.batch_size:
                yield from self.predict(buf)
                buf = []
        if buf:
            yield from self.predict(buf)
