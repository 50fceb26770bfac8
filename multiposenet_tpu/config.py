"""Typed configuration tree for the whole framework.

The reference keeps its live configuration in `TrainParams` / `TestParams`
attribute classes (reference training/trainer.py:44-105, evaluate/tester.py:84-104)
plus module-level constants scattered over nine driver scripts.  Here the whole
hyper-parameter surface is a single dataclass tree; every field documented with
the reference location it mirrors.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (reference network/posenet.py:154-224)."""

    backbone: str = "resnet101"          # 'resnet50' | 'resnet101' (fpn.py:128-134)
    num_joints: int = 18                 # internal joint count incl. synthesized neck
    num_interm_channels: int = 19        # convfin_k* emit 19ch; loss uses :18 (posenet.py:165)
    fpn_channels: int = 256
    keypoint_mid_channels: int = 128     # convt*/convs* width (posenet.py:171-178)
    num_classes: int = 1                 # person only (posenet.py:192)
    num_anchors: int = 9                 # 3 ratios x 3 scales (anchors.py:16-19)
    prior: float = 0.01                  # classifier bias init (posenet.py:205-209)
    prn_node_count: int = 1024           # PRN hidden width (multipose_prn_train.py)
    prn_coeff: int = 2                   # PRN grid = (28*coeff, 18*coeff)
    prn_dropout: float = 0.5
    # compute dtype for conv/matmul activations; params stay float32
    compute_dtype: jnp.dtype = jnp.float32
    # inference-only: trunk BatchNorms folded into the preceding convs'
    # weights+bias (models/fold_bn.py transforms the variables to match).
    # Off by default — training and the reference-parity suites use the
    # unfolded graph.
    fold_bn: bool = False

    @property
    def prn_height(self) -> int:
        return 28 * self.prn_coeff

    @property
    def prn_width(self) -> int:
        return 18 * self.prn_coeff


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """RetinaNet anchor layout (reference network/anchors.py:10-19)."""

    pyramid_levels: Tuple[int, ...] = (3, 4, 5, 6, 7)
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    scales: Tuple[float, ...] = (1.0, 2.0 ** (1.0 / 3.0), 2.0 ** (2.0 / 3.0))

    @property
    def strides(self) -> Tuple[int, ...]:
        return tuple(2 ** l for l in self.pyramid_levels)

    @property
    def sizes(self) -> Tuple[int, ...]:
        return tuple(2 ** (l + 2) for l in self.pyramid_levels)


@dataclasses.dataclass(frozen=True)
class DetectionConfig:
    """Detection thresholds (posenet.py:271,281; tester.py:236,308)."""

    score_thresh: float = 0.05     # in-graph candidate filter
    nms_thresh: float = 0.5        # IoU threshold (+1px convention, lib/nms/src/nms.c:55-58)
    test_score_thresh: float = 0.5  # post-NMS threshold applied at test time
    max_detections: int = 100      # fixed-K NMS capacity (reference is dynamic)
    # focal loss (losses.py:29-30, 65-77)
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    pos_iou: float = 0.5
    neg_iou: float = 0.4
    smooth_l1_beta: float = 1.0 / 9.0
    bbox_std: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    # use the Pallas VMEM-resident suppression kernel on TPU (ops/pallas_nms.py,
    # ~1.5x the XLA masked-loop path); automatic XLA fallback off-TPU
    use_pallas_nms: bool = True


@dataclasses.dataclass(frozen=True)
class PeakConfig:
    """Heatmap peak extraction (tester.py:157-158; joint_utils.py:19-138)."""

    thre1: float = 0.1            # peak score threshold
    max_peaks_per_joint: int = 32  # fixed capacity (reference is dynamic)
    # crowd escalation: when a device peak pass SATURATES the base capacity
    # (some joint type fills every slot, i.e. the top-k may have truncated),
    # the evaluator re-dispatches that image at this capacity so the output
    # protocol matches the reference's unbounded peak lists
    # (tester.py:338-350).  0 disables escalation (base capacity + warning).
    # Precompile warms both tiers.
    escalate_max_peaks: int = 128
    win_size: int = 2              # 5x5 refinement patch
    refine: bool = True


@dataclasses.dataclass(frozen=True)
class PRNConfig:
    """PRN grouping (tester.py:333-513; prn_data_pipeline.py)."""

    in_thres: float = 0.21         # bbox expansion for peak-inside test
    # fixed PRN batch capacity per image (the reference runs PRN per person,
    # unbounded, tester.py:400-406).  COCO val2017 images carry up to ~20
    # person annotations; 64 covers every real image with headroom for
    # detector false positives.  Evaluator logs whenever this clips.
    max_people: int = 64
    # crowd escalation: when an image carries more person boxes than
    # max_people (or more peaks of one joint type than
    # peaks.max_peaks_per_joint), prn_process rebuilds its fixed-shape
    # arrays at the escalated (peaks, people) tier instead of truncating —
    # matching the reference's unbounded per-person PRN loop
    # (tester.py:400-406).  0 disables escalation.
    escalate_max_people: int = 256
    score_window: int = 15         # NxN crop around peak for PRN scoring (tester.py:416)
    min_num_keypoints: int = 3     # training anns need > this many kps (prn_data_pipeline.py:120)
    # greedy mutual-best assignment on device (ops/grouping.py; fuzz-matched
    # against the exact host implementation in eval/grouping.py)
    device_grouping: bool = True
    # inference-only: apply the PRN MLP with the flatten FUSED into the
    # first/last Dense (einsum over (y, x, j) with trace-time-reshaped
    # kernels, engine/inference._prn_mlp_eval) instead of
    # reshape->Dense->reshape.  Same math on the same checkpoint params
    # (equivalence-tested).  MEASURED 2.7 ms/exec SLOWER on v5e at the
    # benched batch-64 e2e shapes (the 3-axis contraction costs XLA more
    # than the flatten copies it removes — docs/PERF.md "Round-5 PRN
    # layout A/B"); default stays off, knob kept for other hardware.
    # Training always uses the module (dropout + f64 gradient oracle).
    fused_mlp: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """COCO data pipeline (datasets/coco.py, coco_data/*)."""

    coco_root: str = "/data/COCO/"
    json_path: str = ""            # COCO.json index (Realtime_Multi-Person preprocessing)
    mask_dir: str = ""
    inp_size: int = 480            # keypoint 480 / detection 608
    feat_stride: int = 4
    # augmentation (COCO_data_pipeline.py:25-40)
    scale_min: float = 0.8
    scale_max: float = 1.2
    scale_prob: float = 1.0
    target_dist: float = 0.6
    max_rotate_degree: float = 40.0
    center_perturb_max: float = 40.0
    flip_prob: float = 0.3
    sigma: float = 7.0             # heatmap target gaussian
    max_gt_boxes: int = 64         # padded GT box capacity (bbox_collater pads with -1)
    max_people: int = 32           # padded person capacity for device-side target gen
    num_workers: int = 8


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Engine parameters (trainer.py:44-105 + per-stage drivers)."""

    exp_name: str = "multipose101"
    subnet: str = "keypoint"       # 'keypoint' | 'detection' | 'prn'
    batch_size: int = 6
    max_epoch: int = 80
    init_lr: float = 1e-4
    weight_decay: float = 0.0
    optimizer: str = "adam"
    # grad clip by INFINITY norm, the reference's norm_type
    # (trainer.py:255-256 passes float('inf')); None/inf = disabled (the
    # reference default, trainer.py:54)
    max_grad_norm: Optional[float] = None
    # ReduceLROnPlateau(factor=lr_decay, patience) on val loss (drivers)
    lr_decay: float = 0.1
    plateau_patience: int = 3
    save_dir: str = "./extra/models"
    ckpt: Optional[str] = None
    re_init: bool = False
    ignore_opt_state: bool = False
    zero_epoch: bool = False
    save_freq_epoch: int = 1
    save_freq_step: int = 10000
    save_nckpt_max: int = 8
    val_nbatch: int = 2
    val_freq: int = 2000
    val_nbatch_end_epoch: int = 200
    print_freq: int = 20
    seed: int = 0
    # parallelism: data-parallel batch axis over the mesh
    mesh_shape: Tuple[int, ...] = (-1,)   # -1 = all devices on the 'data' axis
    mesh_axes: Tuple[str, ...] = ("data",)
    donate_state: bool = True


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Tester parameters (tester.py:84-104)."""

    inp_size: int = 480
    scale_search: Tuple[float, ...] = (0.5, 1.0, 1.5, 2.0, 2.5)
    flip: bool = True
    # resize+average multi-scale heatmaps on device (cv2-exact bicubic as
    # MXU matmuls, ops/resize.py); False = reference cv2 chain on host
    device_resize: bool = True
    # with device_resize, also find peaks on device after the multi-scale
    # fold so only compact peak arrays cross the wire instead of a full
    # (H, W, 18) float map (~22 MB/image; 0.5-1 s over a remote runtime).
    # False = fetch the averaged map and run the host (reference-exact
    # y-major-ordered) peak finder
    device_peaks: bool = True
    # with device_resize, build the multi-scale image pyramid ON DEVICE from
    # one uploaded original (classic cv2 INTER_LINEAR taps, <=1 u8 LSB vs
    # the host chain) instead of uploading ~26 MB of host-resized scales per
    # image.  False = host cv2 resize + per-scale upload
    device_image_resize: bool = True
    # with the full device path, batch up to this many images whose bucketed
    # scale shapes match into ONE set of dispatches (one pyramid exec, one
    # forward per scale at batch group*2, one vmapped fold+peaks exec) so
    # each exec's fixed overhead amortizes across the group.  Numerics are
    # identical to per-image dispatches (batch rows are independent).
    # Default 1 (per image): on v5e the multi-scale forwards are COMPUTE
    # bound and grouping measured ~9% slower (docs/PERF.md); raise it on
    # runtimes where fixed per-exec overhead dominates
    group_size: int = 1
    # coco_eval consumes detection boxes from the scale-1.0 forward ONLY
    # (reference tester.py:169); the device paths skip the RetinaNet heads
    # + NMS on every other scale (~a quarter of those forwards' FLOPs) —
    # final results are identical.  False = compute detections per scale
    # (the reference-shaped per-scale box lists, for parity debugging)
    detect_scale1_only: bool = True
    testdata_dir: str = "./demo/test_images/"
    testresult_dir: str = "./demo/output/"
    write_image: bool = False
    write_json: bool = False
    coco_result_filename: str = "./extra/multipose_coco2017_results.json"
    batch_size: int = 32
    print_freq: int = 20


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    anchors: AnchorConfig = dataclasses.field(default_factory=AnchorConfig)
    detection: DetectionConfig = dataclasses.field(default_factory=DetectionConfig)
    peaks: PeakConfig = dataclasses.field(default_factory=PeakConfig)
    prn: PRNConfig = dataclasses.field(default_factory=PRNConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def keypoint_train_config() -> Config:
    """Stage 1 (multipose_keypoint_train.py:16-113)."""
    c = Config()
    return c.replace(
        data=dataclasses.replace(c.data, inp_size=480),
        train=dataclasses.replace(
            c.train, subnet="keypoint", batch_size=6, max_epoch=80,
            init_lr=1e-4, plateau_patience=3),
    )


def detection_train_config() -> Config:
    """Stage 2 (multipose_detection_train.py:19-53)."""
    c = Config()
    return c.replace(
        data=dataclasses.replace(c.data, inp_size=608),
        train=dataclasses.replace(
            c.train, subnet="detection", batch_size=25, max_epoch=50,
            init_lr=1e-5, plateau_patience=3),
    )


def prn_train_config() -> Config:
    """Stage 3 (multipose_prn_train.py:22-85)."""
    c = Config()
    return c.replace(
        train=dataclasses.replace(
            c.train, subnet="prn", batch_size=8, max_epoch=40,
            init_lr=1e-3, plateau_patience=2),
    )
