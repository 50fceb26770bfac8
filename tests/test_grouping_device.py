"""Fuzz parity: on-device assignment (ops/grouping.py) vs the exact host
implementation (eval/grouping.group_peaks)."""

import numpy as np
import jax.numpy as jnp

from multiposenet_tpu.eval.grouping import group_peaks
from multiposenet_tpu.ops.grouping import assign_peaks

J, P = 17, 8


def _random_case(rng, num_b):
    gh, gw = 56, 36
    peak_xy = rng.uniform(0, 300, (J, P, 2)).astype(np.float32)
    peak_valid = rng.rand(J, P) < 0.4
    boxes = np.zeros((num_b, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 200, num_b)
    boxes[:, 1] = rng.uniform(0, 200, num_b)
    boxes[:, 2] = rng.uniform(30, 120, num_b)
    boxes[:, 3] = rng.uniform(30, 120, num_b)

    inside = np.zeros((num_b, J, P), bool)
    cell_x = np.zeros((num_b, J, P), np.int32)
    cell_y = np.zeros((num_b, J, P), np.int32)
    thres = 0.21
    for b in range(num_b):
        x, y, w, h = boxes[b]
        for j in range(J):
            for p in range(P):
                if not peak_valid[j, p]:
                    continue
                px, py = peak_xy[j, p]
                if (x - w * thres < px < x + w * (1 + thres) and
                        y - h * thres < py < y + h * (1 + thres)):
                    inside[b, j, p] = True
                    cell_x[b, j, p] = min(max(int((px - x) * gw / np.ceil(w)), 0), gw - 1)
                    cell_y[b, j, p] = min(max(int((py - y) * gh / np.ceil(h)), 0), gh - 1)
    # quantized scores force plenty of ties (stresses ordering rules)
    table = np.where(inside, np.round(rng.rand(num_b, J, P) * 4) / 4 + 0.25, 0.0)
    prn_out = rng.rand(num_b, gh, gw, J).astype(np.float32)
    return peak_xy, peak_valid, boxes, inside, cell_x, cell_y, table, prn_out


def _host_slots(res, peak_xy):
    """Recover assigned (x, y, v) per (person, joint) from host results."""
    out = []
    for r in res:
        out.append(np.asarray(r["keypoints"]).reshape(J, 3))
    return np.stack(out) if out else np.zeros((0, J, 3))


def test_device_assignment_matches_host_fuzz():
    rng = np.random.RandomState(0)
    for trial in range(25):
        num_b = rng.randint(1, 6)
        (peak_xy, peak_valid, boxes, inside, cell_x, cell_y, table,
         prn_out) = _random_case(rng, num_b)

        host = group_peaks(table.copy(), inside.copy(), cell_x, cell_y,
                           prn_out, peak_xy, peak_valid, boxes)
        host_kp = _host_slots(host, peak_xy)

        dev = assign_peaks(jnp.asarray(table), jnp.asarray(inside),
                           jnp.asarray(cell_x), jnp.asarray(cell_y),
                           jnp.asarray(prn_out), jnp.asarray(boxes))
        chosen = np.asarray(dev.chosen)
        active_any = np.asarray(dev.active_any)
        fallback = np.asarray(dev.fallback_xy)
        active = np.asarray(dev.active)

        for b in range(num_b):
            for j in range(J):
                hx, hy, hv = host_kp[b, j]
                if hv == 1:  # host assigned a peak
                    p = chosen[b, j]
                    assert p >= 0, (trial, b, j)
                    np.testing.assert_allclose(peak_xy[j, p], [hx, hy],
                                               atol=1e-4,
                                               err_msg=str((trial, b, j)))
                elif hx != 0 or hy != 0:  # host fallback (v=0, nonzero xy)
                    assert not active_any[j] or not active[b, j].any()
                    np.testing.assert_allclose(fallback[b, j], [hx, hy],
                                               atol=1e-3,
                                               err_msg=str((trial, b, j)))
                else:  # unassigned
                    assert chosen[b, j] == -1 or active_any[j], (trial, b, j)
