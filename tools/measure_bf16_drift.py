"""Quantify bf16-vs-f32 drift through the eval path (VERDICT r1 item 8).

Runs the SAME parameters through the fused inference pipeline twice — once
with float32 activations, once with bfloat16 (`compute_dtype`) — and
reports the drift in every quantity the COCO eval protocol consumes:

  heatmaps : max / rms deviation (relative to the f32 dynamic range)
  peaks    : fraction of peak slots whose refined coordinate moved, and the
             mean pixel shift of moved peaks; peak-set membership changes
  boxes    : NMS keep-count delta and max coordinate shift of kept boxes

Parameters come from the reference oracle when torch is available (the
round-2 parity harness: the real reference net's randomized weights pushed
through tools/convert_torch_ckpt.py, realistic BN statistics), else from
the model's own init.

Output: a markdown table for docs/PERF.md.

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
    from multiposenet_tpu.engine.inference import make_full_pipeline
    from multiposenet_tpu.models.posenet import PoseNet

    cfg32 = Config(model=ModelConfig(backbone=args.backbone))
    cfg16 = dataclasses.replace(
        cfg32, model=dataclasses.replace(cfg32.model,
                                         compute_dtype=jnp.bfloat16))
    model32 = PoseNet(cfg32.model)
    model16 = PoseNet(cfg16.model)
    variables = get_params(args.backbone, model32, cfg32)

    hw = (args.size, args.size)
    run32 = make_full_pipeline(model32, cfg32, hw)
    run16 = make_full_pipeline(model16, cfg16, hw)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(
        (rng.rand(args.images, *hw, 3) * 255).astype(np.uint8))

    o32 = jax.device_get(run32(variables, imgs))
    o16 = jax.device_get(run16(variables, imgs))

    # --- heatmaps ---------------------------------------------------------
    h32, h16 = np.asarray(o32.heatmaps, np.float32), np.asarray(o16.heatmaps, np.float32)
    rng_dyn = float(h32.max() - h32.min())
    hm_max = float(np.abs(h32 - h16).max())
    hm_rms = float(np.sqrt(np.mean((h32 - h16) ** 2)))

    # --- peaks ------------------------------------------------------------
    v32 = np.asarray(o32.peaks.valid)
    v16 = np.asarray(o16.peaks.valid)
    c32 = np.asarray(o32.peaks.coords, np.float32)
    c16 = np.asarray(o16.peaks.coords, np.float32)
    both = v32 & v16
    membership_delta = int(np.sum(v32 != v16))
    n_peaks = int(v32.sum())
    if both.any():
        d = np.linalg.norm(c32[both] - c16[both], axis=-1)
        moved = d > 0
        frac_moved = float(moved.mean())
        mean_shift = float(d[moved].mean()) if moved.any() else 0.0
        max_shift = float(d.max())
    else:
        frac_moved = mean_shift = max_shift = 0.0

    # --- boxes ------------------------------------------------------------
    k32 = np.asarray(o32.detections.keep)
    k16 = np.asarray(o16.detections.keep)
    keep_delta = int(np.sum(k32.sum(1) != k16.sum(1)))
    b32 = np.asarray(o32.detections.boxes, np.float32)
    b16 = np.asarray(o16.detections.boxes, np.float32)
    common = k32 & k16
    box_shift = float(np.abs(b32[common] - b16[common]).max()) if common.any() else 0.0
    s32 = np.asarray(o32.detections.scores, np.float32)
    s16 = np.asarray(o16.detections.scores, np.float32)
    score_shift = float(np.abs(s32[common] - s16[common]).max()) if common.any() else 0.0

    print(f"backbone={args.backbone} size={args.size} images={args.images} "
          f"backend={jax.default_backend()}")
    print()
    print("| quantity | f32 vs bf16 drift |")
    print("|---|---|")
    print(f"| heatmap max abs diff | {hm_max:.2e} ({hm_max / max(rng_dyn, 1e-9):.2%} of dynamic range {rng_dyn:.3f}) |")
    print(f"| heatmap rms diff | {hm_rms:.2e} |")
    print(f"| peak slots ({n_peaks} f32 peaks) membership changes | {membership_delta} |")
    print(f"| peaks moved (of common) | {frac_moved:.1%} (mean {mean_shift:.2f}px, max {max_shift:.2f}px, stride-1 units) |")
    print(f"| images with NMS keep-count change | {keep_delta}/{args.images} |")
    print(f"| kept-box coord max shift | {box_shift:.3f}px |")
    print(f"| kept-box score max shift | {score_shift:.2e} |")


if __name__ == "__main__":
    main()
