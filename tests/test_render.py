"""Rendering tests (eval/render.py)."""

import numpy as np

from multiposenet_tpu.eval.render import draw_person, plot_results, COLORS, LIMB_SEQ


def test_draw_person_marks_pixels():
    canvas = np.zeros((100, 100, 3), np.uint8)
    joints = [[20 + 3 * i, 30 + 2 * i, 1] for i in range(17)]
    bbox = [10, 20, 60, 50]
    out = draw_person(canvas, joints, bbox)
    # bbox rectangle drawn in red (BGR 0,0,255)
    assert (out[20, 10:70, 2] > 0).any()
    # joint circles colored
    assert out[30, 20].any()
    # limbs drawn between connected visible joints
    a, b = LIMB_SEQ[0]
    mid = ((np.array(joints[a][:2]) + np.array(joints[b][:2])) // 2).astype(int)
    assert out[mid[1], mid[0]].any()


def test_invisible_joints_not_drawn():
    canvas = np.zeros((100, 100, 3), np.uint8)
    joints = [[50, 50, 0]] * 17  # all v=0
    out = draw_person(canvas, joints, [0, 0, 10, 10])
    # nothing except the bbox rectangle
    inner = out[25:95, 25:95]
    assert not inner.any()


def test_plot_results_multiple_people():
    canvas = np.zeros((120, 120, 3), np.uint8)
    results = []
    for cx in (30, 80):
        kp = []
        for i in range(17):
            kp += [cx + (i % 4), 40 + i, 1]
        results.append({"bbox": [cx - 10, 30, 25, 40], "keypoints": kp})
    out = plot_results(canvas, results)
    assert out[40, 30].any() and out[40, 80].any()
    assert len(COLORS) == 19
