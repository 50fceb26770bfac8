"""Quantify bf16-vs-f32 drift through the eval path (VERDICT r1 item 8).

Runs the SAME parameters through the inference graphs twice — float32 vs
bfloat16 activations (`compute_dtype`) — and reports drift in each
quantity the COCO eval protocol consumes, each compared in an ALIGNED way
(per anchor / per heatmap cell / per peak), so the numbers measure
numeric precision rather than decision-cascade chaos:

  heatmaps : max / rms deviation vs the f32 dynamic range
  peaks    : membership changes + refined-coordinate shifts (the heatmap
             head is rescaled so the random-weight net actually produces
             peaks above thre1 with a realistic ~[0,1] range)
  scores   : per-anchor max-class sigmoid drift (bounds how close to the
             0.05/0.5 thresholds a detection must sit to flip)
  boxes    : per-anchor decoded+clipped coordinate drift in pixels

Parameters come from the reference oracle when torch is available (the
round-2 parity harness weights), else from the model's own init.

Usage: python tools/measure_bf16_drift.py [--images 8] [--size 480]
       [--backbone resnet101]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_params(backbone: str, model, cfg):
    """Oracle-converted params if torch is importable, else model init."""
    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.models.posenet import PoseNet

    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
        import tempfile
        from reference_oracle import (build_reference_posenet,
                                      import_reference_net_utils)
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "convert_torch_ckpt",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "convert_torch_ckpt.py"))
        conv = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(conv)

        layers = 101 if backbone == "resnet101" else 50
        net = build_reference_posenet(layers=layers, seed=0)
        h5 = os.path.join(tempfile.mkdtemp(), "ckpt_0.h5")
        import_reference_net_utils().save_net(h5, net)
        params, batch_stats, _ = conv.convert(h5, backbone=backbone)
        print(f"# params: reference oracle ({backbone}) via h5 converter",
              file=sys.stderr)
        return {"params": params, "batch_stats": batch_stats}
    except ImportError as e:
        print(f"# params: model init (oracle unavailable: {e})", file=sys.stderr)
        size = cfg.data.inp_size
        return model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32),
            jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17),
                      jnp.float32),
            method=PoseNet.init_all)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--size", type=int, default=480)
    ap.add_argument("--backbone", default="resnet101")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.config import Config, ModelConfig
    from multiposenet_tpu.engine.inference import (make_full_pipeline,
                                                   make_keypoint_pipeline)
    from multiposenet_tpu.models.posenet import PoseNet
    from multiposenet_tpu.ops.anchors import anchors_for_shape
    from multiposenet_tpu.ops.boxes import clip_boxes, decode_boxes

    cfg32 = Config(model=ModelConfig(backbone=args.backbone))
    cfg16 = dataclasses.replace(
        cfg32, model=dataclasses.replace(cfg32.model,
                                         compute_dtype=jnp.bfloat16))
    model32 = PoseNet(cfg32.model)
    model16 = PoseNet(cfg16.model)
    variables = get_params(args.backbone, model32, cfg32)

    hw = (args.size, args.size)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(
        (rng.rand(args.images, *hw, 3) * 255).astype(np.uint8))

    fwd32 = make_keypoint_pipeline(model32, cfg32)
    fwd16 = make_keypoint_pipeline(model16, cfg16)

    # --- rescale the heatmap head so random weights produce real peaks ---
    probe_h, _, _ = jax.device_get(fwd32(variables, imgs[:1]))
    peak_target = 0.7
    scale = peak_target / max(float(np.abs(probe_h).max()), 1e-9)
    kh = variables["params"]["keypoint_head"]["convfin"]
    variables["params"]["keypoint_head"]["convfin"] = dict(
        kh, kernel=np.asarray(kh["kernel"]) * scale,
        bias=np.asarray(kh["bias"]) * scale)
    print(f"# convfin rescaled x{scale:.1f} so f32 heatmaps peak ~{peak_target}",
          file=sys.stderr)

    h32, c32, r32 = jax.device_get(fwd32(variables, imgs))
    h16, c16, r16 = jax.device_get(fwd16(variables, imgs))

    # --- heatmaps ---------------------------------------------------------
    h32 = np.asarray(h32, np.float32)
    h16 = np.asarray(h16, np.float32)
    rng_dyn = float(h32.max() - h32.min())
    hm_max = float(np.abs(h32 - h16).max())
    hm_rms = float(np.sqrt(np.mean((h32 - h16) ** 2)))

    # --- peaks (through the full device peak finder) ----------------------
    # random-weight heatmaps carry far more local maxima than a trained
    # model; with the default 32-slot capacity the top-k saturates and
    # ulp-level score jitter swaps WHICH near-identical peaks are kept —
    # a selection artifact, not coordinate drift.  Raise the capacity so
    # the comparison sees every peak and only true thre1 flips remain.
    from multiposenet_tpu.config import PeakConfig
    bigp = PeakConfig(max_peaks_per_joint=192)
    cfgp32 = dataclasses.replace(cfg32, peaks=bigp)
    cfgp16 = dataclasses.replace(cfg16, peaks=bigp)
    run32 = make_full_pipeline(model32, cfgp32, hw)
    run16 = make_full_pipeline(model16, cfgp16, hw)
    p32 = jax.device_get(run32(variables, imgs).peaks)
    p16 = jax.device_get(run16(variables, imgs).peaks)
    v32, v16 = np.asarray(p32.valid), np.asarray(p16.valid)
    c32a = np.asarray(p32.coords, np.float32)
    c16a = np.asarray(p16.coords, np.float32)
    s32p = np.asarray(p32.scores, np.float32)
    n_peaks = int(v32.sum())
    thre1 = cfg32.peaks.thre1

    def nn_stats(top_n):
        """Top-`top_n` f32 peaks per (image, joint) -> nearest bf16 peak
        distance.  Random-weight heatmaps carry ~1000 near-equal local
        maxima per joint, so the CAPACITY-TRUNCATED full sets churn under
        ulp jitter no matter the cap; the strongest few summits per joint
        — the trained-model regime — are the meaningful stability probe."""
        nn, total = [], 0
        for b in range(v32.shape[0]):
            for j in range(v32.shape[1]):
                sel = np.where(v32[b, j])[0][:top_n]  # slots are score-sorted
                a = c32a[b, j][sel]
                total += len(a)
                if len(a) == 0:
                    continue
                c = c16a[b, j][v16[b, j]]
                if len(c) == 0:
                    nn.append(np.full(len(a), np.inf))
                    continue
                nn.append(np.linalg.norm(
                    a[:, None] - c[None, :], axis=-1).min(axis=1))
        nn = np.concatenate(nn) if nn else np.zeros(0)
        moved = float((nn > 0).mean()) if len(nn) else 0.0
        mx = float(nn[np.isfinite(nn)].max()) if np.isfinite(nn).any() else 0.0
        return total, moved, mx

    n_all, moved_all, max_all = nn_stats(10 ** 9)
    n_rob, moved_rob, max_rob = nn_stats(5)

    # --- per-anchor scores and decoded boxes ------------------------------
    s32 = np.max(np.asarray(c32, np.float32), axis=2)
    s16 = np.max(np.asarray(c16, np.float32), axis=2)
    ds = np.abs(s32 - s16)
    anchors = jnp.asarray(anchors_for_shape(hw, cfg32.anchors))
    b32 = np.asarray(clip_boxes(decode_boxes(anchors[None], jnp.asarray(r32)),
                                *hw), np.float32)
    b16 = np.asarray(clip_boxes(decode_boxes(anchors[None], jnp.asarray(r16)),
                                *hw), np.float32)
    db = np.abs(b32 - b16)

    print(f"backbone={args.backbone} size={args.size} images={args.images} "
          f"backend={jax.default_backend()}")
    print()
    print("| quantity | f32 vs bf16 drift |")
    print("|---|---|")
    print(f"| heatmap max abs diff | {hm_max:.2e} ({hm_max / max(rng_dyn, 1e-9):.2%} of dynamic range {rng_dyn:.3f}) |")
    print(f"| heatmap rms diff | {hm_rms:.2e} |")
    print(f"| all {n_all} f32 peaks (capacity-truncated sea of ~equal maxima) | {moved_all:.1%} lack an exact bf16 twin (selection churn, not drift) |")
    print(f"| top-5 summits per (image,joint) ({n_rob} peaks) | {moved_rob:.1%} moved (max {max_rob:.2f}px) |")
    print(f"| per-anchor score drift | max {ds.max():.2e}, rms {np.sqrt(np.mean(ds**2)):.2e} |")
    print(f"| per-anchor decoded box drift | max {db.max():.3f}px, rms {np.sqrt(np.mean(db**2)):.3f}px |")
    print()
    print(f"(a detection flips the 0.05/0.5 score thresholds only within "
          f"+/-{ds.max():.1e} of them; box corners move <= {db.max():.2f}px)")


if __name__ == "__main__":
    main()
