from multiposenet_tpu.ops.anchors import anchors_for_shape, generate_base_anchors
from multiposenet_tpu.ops.boxes import (
    box_iou,
    box_iou_plus1,
    clip_boxes,
    decode_boxes,
    encode_boxes,
)
from multiposenet_tpu.ops.nms import batched_topk_nms, nms_fixed
from multiposenet_tpu.ops.losses import (
    detection_loss,
    focal_loss_single,
    keypoint_loss,
    prn_loss,
)
from multiposenet_tpu.ops.heatmap import make_heatmaps, make_heatmaps_np
from multiposenet_tpu.ops.peaks import find_peaks_refined
from multiposenet_tpu.ops.gaussian import gaussian_blur, gaussian_kernel1d
