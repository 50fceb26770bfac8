"""PRN grouping: assign keypoint peaks to detected persons.

Replicates `Tester.prn_process` (reference evaluate/tester.py:333-513)
exactly, split TPU-first:

- the expensive parts (person grids, gaussian blur, the PRN forward over all
  people at once, per-peak window-sum score tables) run in ONE jitted device
  call (`engine/inference.make_prn_pipeline`) — the reference runs PRN once
  per person with a host round-trip each (tester.py:400-406);
- only the final greedy mutual-best assignment over the (people x peaks)
  score table runs here on host: it is sequential scalar logic over at most
  a few hundred entries.

Reference quirks preserved:
- each peak enters the table with confidence 1, not its heatmap score
  (tester.py:345 `t.append([x, y, 1, idx])`), so a person's pose score is
  (#assigned joints)/17;
- when several peaks of one joint land in the same grid cell of the same
  person, the reference keeps only the last one (numpy overwrite,
  tester.py:393) — deduplicated here the same way;
- the fallback branch when a joint type has NO scored peaks anywhere fills
  every person's joint from the PRN output argmax with visibility 0
  (tester.py:472-483);
- competitor row2 uses ASCENDING argsort including zero entries
  (tester.py:477) — faithfully odd.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np

NUM_COCO_JOINTS = 17


def group_peaks(
    score_table: np.ndarray,   # (B, 17, P) device-computed peak-in-box scores
    inside: np.ndarray,        # (B, 17, P) bool
    cell_x: np.ndarray,        # (B, 17, P) int grid cell of each peak per box
    cell_y: np.ndarray,
    prn_out: np.ndarray,       # (B, gh, gw, 17) PRN outputs
    peak_xy: np.ndarray,       # (17, P, 2) peak pixel coords
    peak_valid: np.ndarray,    # (17, P) bool
    boxes_xywh: np.ndarray,    # (B, 4) valid person boxes only
    file_name: str = "",
    image_id: int = 0,
) -> List[Dict]:
    """Greedy mutual-best assignment -> list of person result dicts
    (the reference's prn_result rows: image_id, category_id, bbox, score,
    keypoints flattened x,y,v * 17 in the INTERNAL 17-joint order)."""
    num_b = boxes_xywh.shape[0]
    num_p = peak_xy.shape[1]
    if num_b == 0:
        return []

    gh, gw = prn_out.shape[1:3]

    # --- deduplicate cell collisions: last peak in a cell wins (overwrite) --
    table = np.array(score_table, np.float64)
    active = np.array(inside, bool)
    for b in range(num_b):
        for j in range(NUM_COCO_JOINTS):
            seen = {}
            for p in range(num_p):
                if active[b, j, p]:
                    seen[(int(cell_y[b, j, p]), int(cell_x[b, j, p]))] = p
            keep = set(seen.values())
            for p in range(num_p):
                if active[b, j, p] and p not in keep:
                    active[b, j, p] = False
    table = np.where(active, table, 0.0)

    bbox_keypoints = np.zeros((num_b, NUM_COCO_JOINTS, 3))

    for j in range(NUM_COCO_JOINTS):
        # peaks of this joint scored inside at least one box
        has_any = active[:, j, :].any()
        if has_any:
            kp_ids = sorted({p for p in range(num_p) if active[:, j, p].any()})
            col_of = {p: i for i, p in enumerate(kp_ids)}
            sub = np.zeros((num_b, len(kp_ids)))
            for p in kp_ids:
                sub[:, col_of[p]] = table[:, j, p] * active[:, j, p]

            for b in range(num_b):
                row = np.argsort(-sub[b])
                if sub[b, row[0]] <= 0:
                    continue
                for r in row:
                    if sub[b, r] <= 0:
                        break
                    column = np.argsort(-sub[:, r])
                    if column[0] == b:
                        p = kp_ids[r]
                        bbox_keypoints[b, j] = [peak_xy[j, p, 0], peak_xy[j, p, 1], 1]
                        break
                    else:
                        # competitor's ASCENDING argsort incl. zeros
                        # (tester.py:477).  NOTE: among exact zero ties the
                        # reference's unstable quicksort pick is
                        # implementation-defined; this twin inherits
                        # numpy's current behavior, the device path
                        # (ops/grouping.py) pins first-index
                        row2 = np.argsort(sub[column[0]])
                        if row2[0] == r:
                            p = kp_ids[r]
                            bbox_keypoints[b, j] = [peak_xy[j, p, 0], peak_xy[j, p, 1], 1]
                            break
        else:
            # fallback: no scored peak of this joint type anywhere ->
            # fill EVERY joint of EVERY person with PRN argmax, v=0
            # (reference tester.py:461-483 — yes, it loops all 17 joints)
            for b in range(num_b):
                bw, bh = boxes_xywh[b, 2], boxes_xywh[b, 3]
                x_scale = float(gw) / math.ceil(bw) if bw > 0 else 1.0
                y_scale = float(gh) / math.ceil(bh) if bh > 0 else 1.0
                for t in range(NUM_COCO_JOINTS):
                    if active[b, t, :].any():
                        continue
                    fm = prn_out[b, :, :, t]
                    my, mx = np.unravel_index(np.argmax(fm), fm.shape)
                    bbox_keypoints[b, t] = [
                        mx / x_scale + boxes_xywh[b, 0],
                        my / y_scale + boxes_xywh[b, 1],
                        0,
                    ]

    results = []
    for b in range(num_b):
        k = np.zeros(NUM_COCO_JOINTS * 3)
        k[0::3] = bbox_keypoints[b, :, 0]
        k[1::3] = bbox_keypoints[b, :, 1]
        k[2::3] = bbox_keypoints[b, :, 2]
        pose_score = float(bbox_keypoints[b, :, 2].sum()) / NUM_COCO_JOINTS
        results.append({
            "image_id": image_id,
            "file_name": file_name,
            "category_id": 1,
            "bbox": [float(v) for v in boxes_xywh[b]],
            "score": pose_score,
            "keypoints": k.tolist(),
        })
    return results


def format_assignment(
    chosen: np.ndarray,       # (B, 17) device-chosen peak slots, -1 none
    active_any: np.ndarray,   # (17,) joint type has any scored peak
    active: np.ndarray,       # (B, 17, P)
    fallback_xy: np.ndarray,  # (B, 17, 2)
    peak_xy: np.ndarray,      # (17, P, 2)
    boxes_xywh: np.ndarray,   # (B, 4)
    file_name: str = "",
    image_id: int = 0,
) -> List[Dict]:
    """Result dicts from the on-device assignment (ops/grouping.assign_peaks)
    — same output contract as `group_peaks`.  The reference's fallback rule
    (tester.py:461-483): when a joint type has NO scored peak anywhere, every
    person's joints without marks are filled from the PRN argmax with v=0."""
    num_b = boxes_xywh.shape[0]
    results = []
    any_empty_joint = bool((~active_any).any())
    for b in range(num_b):
        kp = np.zeros((NUM_COCO_JOINTS, 3))
        for j in range(NUM_COCO_JOINTS):
            p = int(chosen[b, j])
            if p >= 0:
                kp[j] = [peak_xy[j, p, 0], peak_xy[j, p, 1], 1]
            elif any_empty_joint and not active[b, j].any():
                kp[j] = [fallback_xy[b, j, 0], fallback_xy[b, j, 1], 0]
        k = np.zeros(NUM_COCO_JOINTS * 3)
        k[0::3], k[1::3], k[2::3] = kp[:, 0], kp[:, 1], kp[:, 2]
        results.append({
            "image_id": image_id,
            "file_name": file_name,
            "category_id": 1,
            "bbox": [float(v) for v in boxes_xywh[b]],
            "score": float(kp[:, 2].sum()) / NUM_COCO_JOINTS,
            "keypoints": k.tolist(),
        })
    return results


# 18-joint internal -> drop neck (joint 1) -> 17-joint internal order used by
# prn_process (reference tester.py:163-167: types > 1 shift down by one)
def drop_neck_reindex(joint_type_18: int) -> Optional[int]:
    if joint_type_18 == 1:
        return None
    return max(0, joint_type_18 - 1)


# internal 17-joint -> COCO keypoint order (reference tester.py:137)
COCO_ORDER = [0, 14, 13, 16, 15, 4, 1, 5, 2, 6, 3, 10, 7, 11, 8, 12, 9]


def to_coco_order(keypoints_51: Sequence[float]) -> List[float]:
    """Reorder a flattened 17x3 keypoint vector into COCO order
    (reference tester.py:171-177)."""
    out = []
    for i in range(NUM_COCO_JOINTS):
        out.extend(keypoints_51[COCO_ORDER[i] * 3: COCO_ORDER[i] * 3 + 3])
    return out
