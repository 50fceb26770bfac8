"""multiposenet_tpu — a TPU-native MultiPoseNet framework (JAX / Flax / XLA / Pallas).

A from-scratch rebuild of the capabilities of ``LiMeng95/MultiPoseNet.pytorch``
(Kocabas et al., ECCV 2018: bottom-up + top-down multi-person 2D pose
estimation on COCO) designed TPU-first:

- One jit-compiled functional graph per subnet (keypoint / detection / PRN)
  plus a single fused full-pipeline inference graph, NHWC layout, static
  shapes end-to-end.
- Everything the reference does on host numpy in the hot path (anchor
  generation, NMS, heatmap peak finding, ROI gaussian grids, PRN batching)
  is vectorized on-device XLA/Pallas code.
- Data parallelism via `jax.sharding.Mesh` + `NamedSharding`; gradients are
  reduced by XLA collectives, not a DataParallel-style scatter/gather.

Package layout:
  ops/       pure jnp/pallas compute ops (anchors, boxes, nms, losses, peaks, ...)
  models/    Flax modules: ResNet-FPN, keypoint head, RetinaNet heads, PRN
  data/      host-side COCO pipeline (readers, augmentation, batching)
  engine/    training / evaluation loops, checkpointing
  eval/      grouping, multi-scale eval, COCO OKS metric
  parallel/  mesh + sharding helpers
  utils/     logging, meters, timers
"""

__version__ = "0.1.0"
