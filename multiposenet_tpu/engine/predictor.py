"""BatchPredictor — serving-oriented batched inference front-end.

The reference's inference surface is per-image scripts (evaluate/
multipose_test.py); for production serving the unit of work on TPU is a
fixed-shape batch.  BatchPredictor:

- pads/letterboxes arbitrary images to the model's square input on host
  (same pad-to-square + resize as reference tester.py:201-208),
- packs them into fixed-capacity batches (padding ragged tails with zeros),
- runs the fused pipeline + PRN stage (one jit each),
- unpacks per-image person results in original-image coordinates.

H2D of the next batch overlaps device compute via async dispatch.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import cv2
import numpy as np
import jax.numpy as jnp

from multiposenet_tpu.config import Config
from multiposenet_tpu.engine.evaluator import Evaluator, drop_neck
from multiposenet_tpu.models.posenet import PoseNet


class BatchPredictor:
    def __init__(self, cfg: Config, model: Optional[PoseNet] = None,
                 params=None, batch_size: int = 8):
        self.cfg = cfg
        self.batch_size = batch_size
        self.ev = Evaluator(cfg, model, params)
        self.inp = cfg.eval.inp_size

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

    def _finish_chunk(self, out, packed) -> List[List[Dict]]:
        """Fetch one dispatched chunk (single batched device_get) and run
        the host/PRN tail per image."""
        import jax
        coords, scores, valid, dscores, dboxes = jax.device_get(
            (out.peaks.coords, out.peaks.scores, out.peaks.valid,
             out.detections.scores, out.detections.boxes))
        results: List[List[Dict]] = []
        for i, (_, scale) in enumerate(packed):
            js, ps = np.nonzero(valid[i])   # j-major == reference peak order
            if len(js):
                rows = np.column_stack([
                    coords[i, js, ps] * scale, scores[i, js, ps],
                    np.arange(len(js)), js])
            else:
                rows = np.zeros((0, 5))
            joints = drop_neck(rows)
            keep = dscores[i] > self.cfg.detection.test_score_thresh
            boxes = (dboxes[i][keep] * scale).tolist()
            results.append(self.ev.prn_process(joints, boxes))
        return results

    def predict(self, images_bgr: Sequence[np.ndarray]) -> List[List[Dict]]:
        """BGR images (any sizes) -> per-image person result lists.

        Chunks are dispatched 2 deep: the device runs chunk k+1's forward
        while the host unpacks chunk k (jax dispatch is async)."""
        results: List[List[Dict]] = []
        pipeline = self.ev.pipeline((self.inp, self.inp))
        pending = []
        for lo in range(0, len(images_bgr), self.batch_size):
            chunk = images_bgr[lo: lo + self.batch_size]
            packed = [self._pack(im) for im in chunk]
            batch = np.zeros((self.batch_size, self.inp, self.inp, 3),
                             np.uint8)
            for i, (rgb, _) in enumerate(packed):
                batch[i] = rgb
            pending.append((pipeline(self.ev.params, jnp.asarray(batch)),
                            packed))
            if len(pending) > 2:
                results.extend(self._finish_chunk(*pending.pop(0)))
        for out, packed in pending:
            results.extend(self._finish_chunk(out, packed))
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
