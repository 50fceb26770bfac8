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


def test_fractional_visibility_truncates_like_reference(monkeypatch):
    """The reference's DOT check int-truncates (joint_utils.py:164
    ``int(joints[i][2]) == 0`` skips) but its LIMB check is a float
    compare (``joints[a][2] == 0`` skips): for fractional v in (0, 1) the
    reference draws the limb but not the dot — so must we.  Counted via
    the cv2 primitives so limb sticks crossing joint sites can't mask a
    wrongly drawn/skipped dot."""
    from multiposenet_tpu.eval import render as render_mod

    calls = {"circle": 0, "poly": 0}
    real_circle = render_mod.cv2.circle
    real_poly = render_mod.cv2.fillConvexPoly

    def counting_circle(*a, **k):
        calls["circle"] += 1
        return real_circle(*a, **k)

    def counting_poly(*a, **k):
        calls["poly"] += 1
        return real_poly(*a, **k)

    monkeypatch.setattr(render_mod.cv2, "circle", counting_circle)
    monkeypatch.setattr(render_mod.cv2, "fillConvexPoly", counting_poly)

    joints = [[20 + 4 * i, 30 + 3 * i, 0.5] for i in range(17)]
    draw_person(np.zeros((100, 100, 3), np.uint8), joints, [0, 0, 5, 5])
    assert calls["circle"] == 0          # int(0.5) == 0 -> no dots
    assert calls["poly"] == len(LIMB_SEQ)  # 0.5 != 0 -> every limb drawn

    calls["circle"] = calls["poly"] = 0
    draw_person(np.zeros((100, 100, 3), np.uint8),
                [[50, 50, 0.0]] * 17, [0, 0, 5, 5])
    assert calls == {"circle": 0, "poly": 0}  # v=0 draws nothing

    draw_person(np.zeros((100, 100, 3), np.uint8),
                [[50, 50, 1.5]] * 17, [0, 0, 5, 5])
    assert calls["circle"] == 17  # int(1.5) == 1 -> dots visible


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
