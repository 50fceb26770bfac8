"""Trained-weights FULL-protocol differential vs the reference pipeline.

The strongest parity evidence this environment can produce (VERDICT r4
item 1): the oracle-weights protocol differential
(tests/test_reference_eval_parity.py) proves both stacks agree on random
weights; this tool proves the reference's OWN pipeline reproduces our AP
on a model TRAINED in this framework — real peak contention, borderline
matches and crowd fallbacks included.

Chain:
  1. `tools/export_torch_ckpt.py` exports the orbax checkpoint to the
     reference h5 state_dict layout (bit-exact through the reference's
     own load_net — tests/test_export_torch_ckpt.py).
  2. The reference poseNet (reference network/posenet.py) loads it via
     the reference's own `net_utils.load_net` (net_utils.py:69-92) and
     the reference's ENTIRE `Tester.coco_eval` (tester.py:131-193) runs
     over the synthetic COCO val split: 5-scale + flip forwards, heatmap
     averaging, host peak finding, neck drop, prn_process grouping, COCO
     joint reorder.
  3. OUR `cli coco-eval` runs the same checkpoint over the same split.
  4. ONE scorer (eval/cocoeval.KeypointEval over data/coco_json.COCOIndex
     — the pycocotools-protocol twin, fuzz-matched to 1e-9) scores both
     result files; all 10 OKS summary stats must agree within
     --assert-tol.

pycocotools is absent here, so step 2 binds the reference's COCO /
COCOeval symbols to COCOIndex and a capture adapter — exactly as the
oracle-weights differential does.  cv2.resize's default-interpolation
fx/fy form is rewritten to the dsize form while the reference runs (cv2
5.x IPP-kernel divergence; see eval/multiscale.crop_with_factor).

Usage:
  python tools/trained_weights_differential.py \
      --ckpt /tmp/mpn_gate_models/prn/ckpt_9_0.00347.best \
      --coco-root /tmp/mpn_gate_coco --out-dir /tmp/twd \
      [--backbone resnet50] [--inp-size 480] [--n-images 0=all] \
      [--assert-tol 0.02]

Measured bands (2026-08-20, the AP-0.643 gate checkpoint): cheap mode
(2 images) delta 0.0000 on all 10 stats; full 16-image split 0.0224 —
one NMS IoU-0.4901-vs-0.5 razor tie between the two stacks'
independently-computed forwards on one crowd image (docs/PARITY.md).
Full-split runs should pass --assert-tol 0.025 to sit just above that
single-tie quantum; anything materially past it is a real divergence.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
STATS = ["AP", "AP50", "AP75", "AP_medium", "AP_large",
         "AR", "AR50", "AR75", "AR_medium", "AR_large"]


def export_to_h5(ckpt_dir: str, backbone: str, out_h5: str) -> None:
    from multiposenet_tpu.utils.toolload import load_tool
    load_tool("export_torch_ckpt").main(
        [ckpt_dir, out_h5, "--backbone", backbone])


@contextlib.contextmanager
def _classic_resize():
    """Rewrite cv2.resize's default-interpolation fx/fy form to the dsize
    form while the reference runs (restores the classic bilinear the
    2018-era reference produced; explicit-interpolation calls — the
    INTER_CUBIC heatmap chain — pass through untouched)."""
    import cv2

    orig = cv2.resize

    def classic(src, dsize, *args, **kwargs):
        # rewrite only the fully-kwarg form the reference uses
        # (tester.py:68); positional fx/fy or a missing factor pass
        # through untouched so cv2's own semantics (and errors) apply
        if (dsize is None and not args and "interpolation" not in kwargs
                and kwargs.get("fx") is not None
                and kwargs.get("fy") is not None):
            fx, fy = kwargs.pop("fx"), kwargs.pop("fy")
            h, w = src.shape[:2]
            dsize = (round(w * fx), round(h * fy))
        return orig(src, dsize, *args, **kwargs)

    cv2.resize = classic
    try:
        yield
    finally:
        cv2.resize = orig


def run_reference_coco_eval(h5_path: str, coco_root: str, out_json: str,
                            inp_size: int, backbone: str,
                            n_images: int = 0) -> dict:
    """Reference Tester.coco_eval end-to-end on a load_net-restored net.

    Returns the 10 summary stats as scored through OUR KeypointEval (the
    COCOeval adapter) — purely diagnostic; the authoritative comparison
    re-scores both result files with one scorer in main()."""
    import types

    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    try:
        from reference_oracle import (import_reference,
                                      import_reference_net_utils,
                                      import_reference_tester,
                                      make_reference_tester)
    finally:
        sys.path.pop(0)

    from multiposenet_tpu.data.coco_json import COCOIndex
    from multiposenet_tpu.eval.cocoeval import KeypointEval

    posenet = import_reference()
    net_utils = import_reference_net_utils()
    tester_mod = import_reference_tester()

    layers = int(backbone.replace("resnet", ""))
    net = posenet.poseNet(layers)
    net_utils.load_net(h5_path, net, load_state_dict=True)
    net.eval()

    captured = {}

    class _COCO(COCOIndex):
        # pycocotools drop-in; truncates the img-id list when the
        # differential runs in cheap mode (n_images > 0)
        def getImgIds(self, catIds=(), **kw):  # noqa: N802
            ids = self.get_img_ids(catIds)
            return ids[:n_images] if n_images else ids

    class _COCOevalAdapter:
        def __init__(self, gt, dt, kind):
            assert kind == "keypoints"
            self.gt, self.dt = gt, dt
            self.params = types.SimpleNamespace(imgIds=None)

        def evaluate(self):
            self.ev = KeypointEval(self.gt, self.dt,
                                   img_ids=self.params.imgIds)

        def accumulate(self):
            captured["metrics"] = self.ev.evaluate()

        def summarize(self):
            print(self.ev.summarize())

    ref = make_reference_tester(
        net, inp_size=inp_size, subnet_name="both", coco_root=coco_root,
        coco_result_filename=out_json, testresult_write_json=True)

    saved = (tester_mod.COCO, tester_mod.COCOeval)
    tester_mod.COCO, tester_mod.COCOeval = _COCO, _COCOevalAdapter
    try:
        with _classic_resize(), torch.no_grad():
            ref.coco_eval()
    finally:
        tester_mod.COCO, tester_mod.COCOeval = saved
    return captured.get("metrics", {})


def run_our_coco_eval(ckpt_dir: str, coco_root: str, out_json: str,
                      metrics_json: str, inp_size: int, backbone: str,
                      n_images: int = 0, platform: str = "",
                      extra_flags=()) -> dict:
    """Our production eval path via the CLI in a subprocess (the exact
    entry the synth gate drives)."""
    cmd = [sys.executable, "-m", "multiposenet_tpu.cli", "coco-eval",
           "--coco-root", coco_root, "--ckpt", ckpt_dir,
           "--backbone", backbone, "--inp-size", str(inp_size),
           "--result-file", out_json, "--metrics-file", metrics_json,
           *extra_flags]
    if n_images:
        cmd += ["--max-images", str(n_images)]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    if platform:
        env["MPN_PLATFORM"] = platform
    subprocess.run(cmd, check=True, env=env, cwd=REPO)
    with open(metrics_json) as f:
        return json.load(f)


def score_results(coco_root: str, result_json: str, n_images: int = 0
                  ) -> dict:
    """Score one result file with the single shared scorer."""
    from multiposenet_tpu.data.coco_json import COCOIndex
    from multiposenet_tpu.eval.cocoeval import KeypointEval

    gt = COCOIndex(os.path.join(
        coco_root, "annotations/person_keypoints_val2017.json"))
    ids = gt.get_img_ids(cat_ids=[1])
    if n_images:
        ids = ids[:n_images]
    dt = gt.load_res(result_json)
    return KeypointEval(gt, dt, img_ids=ids).evaluate()


def result_count_by_image(result_json: str) -> dict:
    with open(result_json) as f:
        res = json.load(f)
    out = {}
    for r in res:
        out[r["image_id"]] = out.get(r["image_id"], 0) + 1
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir (gate stage-3 best)")
    ap.add_argument("--coco-root", required=True)
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--inp-size", type=int, default=480)
    ap.add_argument("--n-images", type=int, default=0, help="0 = all")
    ap.add_argument("--assert-tol", type=float, default=0.02)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--our-platform", default="",
                    help="MPN_PLATFORM for our subprocess (e.g. cpu)")
    ap.add_argument("--our-flags", default="",
                    help="extra cli coco-eval flags for OUR side, e.g. "
                         "'--host-resize --host-peaks --host-image-resize "
                         "--host-grouping' for the reference-exact chain")
    ap.add_argument("--reuse-ref", action="store_true",
                    help="skip the export + reference run when the "
                         "out-dir already holds ref_results.json (A/B "
                         "several of OUR eval modes against one "
                         "reference pass)")
    args = ap.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    h5 = os.path.join(args.out_dir, "trained_export.h5")
    ref_json = os.path.join(args.out_dir, "ref_results.json")
    our_json = os.path.join(args.out_dir, "our_results.json")
    our_metrics_json = os.path.join(args.out_dir, "our_metrics.json")

    reuse = args.reuse_ref and os.path.isfile(ref_json)
    if not reuse:
        print(f"[1/4] export {args.ckpt} -> {h5}")
        export_to_h5(args.ckpt, args.backbone, h5)

    print("[2/4] our Evaluator.coco_eval (cli subprocess)")
    run_our_coco_eval(args.ckpt, args.coco_root, our_json,
                      our_metrics_json, args.inp_size, args.backbone,
                      args.n_images, platform=args.our_platform,
                      extra_flags=tuple(args.our_flags.split()))

    if reuse:
        print(f"[3/4] reusing existing {ref_json}")
    else:
        print("[3/4] reference Tester.coco_eval (load_net-restored net)")
        run_reference_coco_eval(h5, args.coco_root, ref_json,
                                args.inp_size, args.backbone,
                                args.n_images)

    print("[4/4] one-scorer comparison")
    ref_stats = score_results(args.coco_root, ref_json, args.n_images)
    our_stats = score_results(args.coco_root, our_json, args.n_images)

    rc, oc = result_count_by_image(ref_json), result_count_by_image(our_json)
    count_rows = [f"| {i} | {rc.get(i, 0)} | {oc.get(i, 0)} |"
                  for i in sorted(set(rc) | set(oc))]

    lines = ["| stat | reference pipeline | ours | delta |",
             "|---|---|---|---|"]
    worst = 0.0
    for k in STATS:
        # a key absent from either scorer output is an error, not a
        # vacuous -1 == -1 match (guards scorer renames/regressions)
        missing = [s for s, m in (("ref", ref_stats), ("ours", our_stats))
                   if k not in m]
        if missing:
            raise KeyError(f"summary stat {k!r} missing from "
                           f"{'/'.join(missing)} scorer output")
        r, o = float(ref_stats[k]), float(our_stats[k])
        d = o - r
        worst = max(worst, abs(d))
        lines.append(f"| {k} | {r:.4f} | {o:.4f} | {d:+.4f} |")
    table = "\n".join(lines)
    report = (
        f"# Trained-weights protocol differential\n\n"
        f"ckpt: `{args.ckpt}`  data: `{args.coco_root}` "
        f"({args.n_images or 'all'} images, inp_size {args.inp_size}"
        + (f", our flags: `{args.our_flags}`" if args.our_flags else "")
        + ")\n\n"
        f"{table}\n\nmax |delta| = {worst:.4f} "
        f"(tol {args.assert_tol})\n\n"
        f"## results per image (ref / ours)\n\n"
        f"| image | ref | ours |\n|---|---|---|\n"
        + "\n".join(count_rows) + "\n")
    with open(os.path.join(args.out_dir, "report.md"), "w") as f:
        f.write(report)
    print(report)

    if worst > args.assert_tol:
        print(f"FAIL: trained-weights differential max |delta| {worst:.4f} "
              f"> {args.assert_tol}")
        return 1
    print(f"PASS: all {len(STATS)} stats within |delta| <= "
          f"{args.assert_tol}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
