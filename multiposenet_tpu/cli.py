"""Command-line interface — replaces the reference's nine edit-the-constants
driver scripts (training/multipose_*_train.py, evaluate/multipose_*.py) with
one typed CLI over the Config tree.

  python -m multiposenet_tpu.cli train --subnet keypoint --coco-root /data/COCO
  python -m multiposenet_tpu.cli val --subnet detection --ckpt <dir>
  python -m multiposenet_tpu.cli test --ckpt <dir> --testdata ./demo/test_images
  python -m multiposenet_tpu.cli coco-eval --ckpt <dir> --coco-root /data/COCO
  python -m multiposenet_tpu.cli bench
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def _common(p: argparse.ArgumentParser):
    p.add_argument("--backbone", default="resnet101",
                   choices=["resnet50", "resnet101"])
    p.add_argument("--coco-root", default="/data/COCO/")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir (orbax) to load")
    p.add_argument("--exp-name", default=None)
    p.add_argument("--inp-size", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--max-epoch", type=int, default=None)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--save-dir", default="./extra/models")
    p.add_argument("--bf16", action="store_true",
                   help="run conv/matmul activations in bfloat16 (~+21%% "
                        "inference throughput on v5e; params stay float32)")


def build_config(args, subnet: str):
    from multiposenet_tpu.config import (
        Config, detection_train_config, keypoint_train_config,
        prn_train_config)
    cfg = {"keypoint": keypoint_train_config,
           "detection": detection_train_config,
           "prn": prn_train_config}.get(subnet, Config)()
    model = dataclasses.replace(cfg.model, backbone=args.backbone)
    if getattr(args, "bf16", False):
        import jax.numpy as jnp
        model = dataclasses.replace(model, compute_dtype=jnp.bfloat16)
    data = dataclasses.replace(
        cfg.data, coco_root=args.coco_root,
        json_path=os.path.join(args.coco_root, "COCO.json"),
        mask_dir=args.coco_root, num_workers=args.num_workers,
        **({"inp_size": args.inp_size} if args.inp_size else {}))
    tr = {}
    if args.exp_name:
        tr["exp_name"] = args.exp_name
    if args.batch_size:
        tr["batch_size"] = args.batch_size
    if args.lr:
        tr["init_lr"] = args.lr
    if args.max_epoch:
        tr["max_epoch"] = args.max_epoch
    tr["save_dir"] = args.save_dir
    tr["ckpt"] = args.ckpt
    train = dataclasses.replace(cfg.train, subnet=subnet or cfg.train.subnet,
                                **tr)
    # --inp-size also sets the EVAL base size (reference TestParams.inp_size,
    # tester.py:87 — the multi-scale search scales off it); without this the
    # flag would silently not affect coco-eval/test/precompile
    ev = (dataclasses.replace(cfg.eval, inp_size=args.inp_size)
          if args.inp_size else cfg.eval)
    return dataclasses.replace(cfg, model=model, data=data, train=train,
                               eval=ev)


def make_loaders(cfg, subnet: str, training: bool):
    from multiposenet_tpu.data.coco_json import COCOIndex
    from multiposenet_tpu.data.datasets import (
        DetectionDataset, KeypointDataset, PRNDataset,
        load_coco_json_index, split_keypoint_records)
    from multiposenet_tpu.data.loader import Loader

    if subnet == "keypoint":
        records = load_coco_json_index(cfg.data.json_path)
        idx = split_keypoint_records(records, training)
        ds = KeypointDataset(records, idx, os.path.join(cfg.data.coco_root, "images"),
                             cfg.data.mask_dir, cfg.data, augment=training)
    elif subnet == "detection":
        split = "train2017" if training else "val2017"
        ann = os.path.join(cfg.data.coco_root, "annotations",
                           f"person_keypoints_{split}.json")
        coco = COCOIndex(ann)
        records = load_coco_json_index(cfg.data.json_path)
        img_ids = set(coco.get_img_ids())
        idx = [i for i, r in enumerate(records)
               if int(r["image_id"]) in img_ids]
        ds = DetectionDataset(records, idx, coco,
                              os.path.join(cfg.data.coco_root, split),
                              cfg.data, augment=training)
    else:  # prn
        split = "train2017" if training else "val2017"
        ann = os.path.join(cfg.data.coco_root, "annotations",
                           f"person_keypoints_{split}.json")
        ds = PRNDataset(COCOIndex(ann), cfg)

    # Multi-host: cfg.train.batch_size is the GLOBAL batch; each host loads
    # a disjoint shard sized batch/process_count.  Validation is sharded the
    # same way (deterministic order) — the jitted val_step computes the loss
    # over the GLOBAL mesh-sharded batch, so every host still sees the same
    # value and plateau-LR decisions stay in lockstep.
    from multiposenet_tpu.parallel import distributed as dist
    if dist.process_count() > 1:
        return Loader(ds, dist.per_host_batch(cfg.train.batch_size),
                      shuffle=training, num_workers=cfg.data.num_workers,
                      shard_id=dist.process_index(),
                      num_shards=dist.process_count())
    return Loader(ds, cfg.train.batch_size, shuffle=training,
                  num_workers=cfg.data.num_workers)


def cmd_train(args):
    from multiposenet_tpu.engine.trainer import Trainer
    from multiposenet_tpu.parallel import distributed as dist
    dist.initialize(args.coordinator, num_processes=args.num_processes,
                    process_id=args.process_id)
    cfg = build_config(args, args.subnet)
    train = make_loaders(cfg, args.subnet, True)
    val = make_loaders(cfg, args.subnet, False)
    Trainer(cfg, train_data=train, val_data=val,
            init_ckpt_params=args.init_params).train()


def cmd_val(args):
    from multiposenet_tpu.engine.trainer import Trainer
    cfg = build_config(args, args.subnet)
    val = make_loaders(cfg, args.subnet, False)
    t = Trainer(cfg, train_data=None, val_data=val)
    t.validate(args.max_batches)


def _load_eval(args, subnet="keypoint"):
    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.engine import checkpoint as ckpt_lib
    from multiposenet_tpu.engine.evaluator import Evaluator
    from multiposenet_tpu.models.posenet import PoseNet

    cfg = build_config(args, subnet)
    model = PoseNet(cfg.model)
    size = cfg.data.inp_size
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3), jnp.float32),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17),
                  jnp.float32),
        method=PoseNet.init_all)
    if args.ckpt:
        # full model state: params AND BN running stats (reference load_net
        # restores the whole state_dict, net_utils.py:69-110)
        variables, _ = ckpt_lib.restore_variables_partial(args.ckpt, variables)
    if getattr(args, "fold_bn", False):
        from multiposenet_tpu.models.fold_bn import fold_bn_variables
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, fold_bn=True))
        model = PoseNet(cfg.model)
        variables = fold_bn_variables(variables)
    return cfg, Evaluator(cfg, model, variables)


def cmd_test(args):
    # validate inputs before the (slow) model init
    if not os.path.isdir(args.testdata):
        sys.exit(f"error: --testdata directory not found: {args.testdata}")
    cfg, ev = _load_eval(args)
    ev.cfg = dataclasses.replace(
        ev.cfg, eval=dataclasses.replace(ev.cfg.eval, write_image=True,
                                         write_json=True,
                                         testdata_dir=args.testdata,
                                         testresult_dir=args.testresult))
    results = ev.test()
    print(f"{len(results)} person instances detected")


def _cluster_flags(p):
    """Multi-host cluster membership — shared by `train` and `coco-eval`
    (which auto-shards images per process and gathers results)."""
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 for multi-host runs "
                        "(with MPN_DISTRIBUTED=1, TPU pod / SLURM env is "
                        "auto-detected instead)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total hosts (required with --coordinator outside "
                        "auto-detectable clusters)")
    p.add_argument("--process-id", type=int, default=None,
                   help="this host's index (see --num-processes)")


def _apply_eval_flags(ev, args):
    """Shared eval-path flags for `coco-eval` AND `precompile` — the two
    MUST see the same config or precompile warms the wrong pipeline
    variants (e.g. --host-resize dispatches every scale with detections,
    which a default precompile no longer compiles)."""
    updates = {}
    if args.host_resize:
        updates["device_resize"] = False
    if args.host_peaks:
        updates["device_peaks"] = False
    if args.host_image_resize:
        updates["device_image_resize"] = False
    if args.group_size is not None:
        updates["group_size"] = args.group_size
    if args.detect_all_scales:
        updates["detect_scale1_only"] = False
    if updates:
        ev.cfg = dataclasses.replace(
            ev.cfg, eval=dataclasses.replace(ev.cfg.eval, **updates))
    peaks_up, prn_up, det_up = {}, {}, {}
    if args.max_peaks is not None:
        peaks_up["max_peaks_per_joint"] = args.max_peaks
    if args.max_people is not None:
        prn_up["max_people"] = args.max_people
    if args.no_escalate:
        peaks_up["escalate_max_peaks"] = 0
        prn_up["escalate_max_people"] = 0
    if args.no_refine:
        peaks_up["refine"] = False
    if args.xla_nms:
        det_up["use_pallas_nms"] = False
    if args.host_grouping:
        prn_up["device_grouping"] = False
    if peaks_up:
        ev.cfg = dataclasses.replace(
            ev.cfg, peaks=dataclasses.replace(ev.cfg.peaks, **peaks_up))
    if prn_up:
        ev.cfg = dataclasses.replace(
            ev.cfg, prn=dataclasses.replace(ev.cfg.prn, **prn_up))
    if det_up:
        ev.cfg = dataclasses.replace(
            ev.cfg, detection=dataclasses.replace(ev.cfg.detection, **det_up))


def cmd_coco_eval(args):
    ann = os.path.join(args.coco_root, "annotations/person_keypoints_val2017.json")
    if not os.path.isfile(ann):
        sys.exit(f"error: annotations not found: {ann}")
    from multiposenet_tpu.parallel import distributed as dist
    # multi-host: join the cluster BEFORE building the model; coco_eval
    # then auto-shards images per process and gathers results on process 0
    dist.initialize(args.coordinator, num_processes=args.num_processes,
                    process_id=args.process_id)
    if args.eval_shard and dist.process_count() > 1:
        # a manual shard on a cluster would run the SAME slice on every
        # host and silently skip the rest — reject the combination
        sys.exit("error: --eval-shard conflicts with distributed mode; "
                 "on a cluster each process auto-shards (drop --eval-shard)")
    shard = (0, 1)
    if args.eval_shard:
        i, n = args.eval_shard.split(":")
        shard = (int(i), int(n))
        if not (0 <= shard[0] < shard[1]):
            sys.exit(f"error: bad --eval-shard {args.eval_shard}")
        if shard[1] > 1 and not args.result_file:
            sys.exit("error: --eval-shard requires --result-file "
                     "(merge shards with `cli merge-results`)")
    _, ev = _load_eval(args)
    _apply_eval_flags(ev, args)
    metrics = ev.coco_eval(max_images=args.max_images,
                           result_file=args.result_file, bucket=args.bucket,
                           shard=shard, skip_metrics=shard != (0, 1))
    if args.metrics_file and shard == (0, 1) and dist.is_primary():
        # always written when requested (empty dict when no detections) so
        # downstream gates/diffs read a definite verdict, not a missing file
        import json
        with open(args.metrics_file, "w") as f:
            json.dump(metrics, f, indent=2)


def cmd_merge_results(args):
    """Concatenate per-shard result files and run the OKS evaluation."""
    import json
    from multiposenet_tpu.data.coco_json import COCOIndex
    from multiposenet_tpu.eval.cocoeval import KeypointEval

    results = []
    for path in args.results:
        with open(path) as f:
            results.extend(json.load(f))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f)
    ann = os.path.join(args.coco_root,
                       "annotations/person_keypoints_val2017.json")
    gt = COCOIndex(ann)
    img_ids = gt.get_img_ids(cat_ids=[1])
    if args.max_images:
        img_ids = img_ids[:args.max_images]
    dt = gt.load_res(results)
    ev = KeypointEval(gt, dt, img_ids=img_ids)
    ev.evaluate()
    print(ev.summarize())


def cmd_precompile(args):
    """Warm the XLA compilation cache for every multi-scale eval shape.
    Run once before `coco-eval` (cold remote TPU compiles are ~minutes per
    shape; cached ones are instant with JAX_COMPILATION_CACHE_DIR set)."""
    shapes = []
    if args.shapes:
        for tok in args.shapes.split(","):
            h, w = tok.lower().split("x")
            shapes.append((int(h), int(w)))
    else:
        from multiposenet_tpu.data.coco_json import COCOIndex
        ann = os.path.join(args.coco_root,
                           "annotations/person_keypoints_val2017.json")
        if not os.path.isfile(ann):
            sys.exit(f"error: annotations not found: {ann}; "
                     "pass --shapes HxW,HxW instead")
        gt = COCOIndex(ann)
        ids = gt.get_img_ids(cat_ids=[1])
        if args.max_images:
            ids = ids[:args.max_images]
        shapes = [(im["height"], im["width"])
                  for i in ids for im in gt.load_imgs(i)]
    _, ev = _load_eval(args)
    _apply_eval_flags(ev, args)
    compiled = ev.precompile(shapes, bucket=args.bucket)
    print(f"precompiled {len(compiled)} pipeline shapes: "
          + ", ".join(f"{h}x{w}" for h, w in compiled))


def cmd_bench(_args):
    import bench
    bench.main()


def cmd_export_torch(args):
    """Export an orbax checkpoint to the reference's h5 state_dict layout
    (tools/export_torch_ckpt.py) so a model trained here can be loaded by
    the original PyTorch code base via its load_net (net_utils.py:69-92)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "export_torch_ckpt",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "export_torch_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main([args.ckpt_dir, args.out_h5,
              "--backbone", args.backbone, "--epoch", str(args.epoch)])


def cmd_export_stablehlo(args):
    """Export the fused e2e pose pipeline (weights baked in as constants)
    as a serialized StableHLO serving artifact (engine/export_model.py).
    The reference has no deployment artifact — its serving unit is the
    full training codebase (evaluate/multipose_test.py)."""
    from multiposenet_tpu.engine.export_model import export_pose_pipeline

    # a deployment artifact with PRNGKey(0) init weights baked in would look
    # valid and serve nonsense — refuse, unlike the interactive eval cmds
    if not args.ckpt:
        sys.exit("error: export-stablehlo requires --ckpt (the artifact "
                 "bakes the weights in; exporting random init is never "
                 "what you want)")
    cfg, ev = _load_eval(args)
    batch = args.batch_size or 8
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    blob = export_pose_pipeline(ev.model, ev.cfg, ev.params, batch=batch,
                                platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out}: {len(blob) / 1e6:.1f} MB, batch={batch}, "
          f"inp={ev.cfg.eval.inp_size}, platforms={','.join(platforms)}")


def main(argv=None):
    # MPN_PLATFORM=cpu pins the JAX backend for this CLI process (e.g. CPU
    # dry runs of the parity runbook on machines whose sitecustomize pins a
    # TPU default; JAX_PLATFORMS can be overridden by such config, this
    # cannot).  Must run before first device use.
    plat = os.environ.get("MPN_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    p = argparse.ArgumentParser("multiposenet_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train")
    _common(pt)
    pt.add_argument("--subnet", required=True,
                    choices=["keypoint", "detection", "prn"])
    pt.add_argument("--init-params", default=None,
                    help="params-only checkpoint for staged training")
    _cluster_flags(pt)
    pt.set_defaults(fn=cmd_train)

    pv = sub.add_parser("val")
    _common(pv)
    pv.add_argument("--subnet", required=True,
                    choices=["keypoint", "detection", "prn"])
    pv.add_argument("--max-batches", type=int, default=1000000)
    pv.set_defaults(fn=cmd_val)

    pd = sub.add_parser("test")
    _common(pd)
    pd.add_argument("--testdata", default="./demo/test_images/")
    pd.add_argument("--testresult", default="./demo/output/")
    pd.set_defaults(fn=cmd_test)

    def _eval_path_flags(p):
        """Flags that select eval pipeline variants — shared by coco-eval
        and precompile so the warmed compile set always matches the
        dispatched one (_apply_eval_flags)."""
        p.add_argument("--host-resize", action="store_true",
                       help="resize/average multi-scale heatmaps with cv2 "
                            "on the host (reference-exact chain) instead "
                            "of the cv2-matching on-device matmul path")
        p.add_argument("--host-peaks", action="store_true",
                       help="fetch the averaged heatmap and find peaks on "
                            "the host (reference y-major peak order) "
                            "instead of on device after the fold")
        p.add_argument("--host-image-resize", action="store_true",
                       help="build the multi-scale image pyramid with host "
                            "cv2 resizes (one upload per scale) instead of "
                            "on device from one uploaded original")
        p.add_argument("--group-size", type=int, default=None,
                       help="batch up to N same-bucket images per device "
                            "dispatch (1 = per-image)")
        p.add_argument("--detect-all-scales", action="store_true",
                       help="run the RetinaNet branch on every scale (the "
                            "reference-shaped per-scale box lists) instead "
                            "of scale 1.0 only — results are identical; "
                            "boxes from other scales are never consumed "
                            "(tester.py:169)")
        p.add_argument("--fold-bn", action="store_true",
                       help="fold trunk BatchNorms into the preceding "
                            "convs' weights+bias after the checkpoint load "
                            "(inference-only rewrite, models/fold_bn.py); "
                            "numerics shift by float reassociation only")
        p.add_argument("--max-peaks", type=int, default=None,
                       help="base per-joint peak capacity "
                            "(cfg.peaks.max_peaks_per_joint)")
        p.add_argument("--max-people", type=int, default=None,
                       help="base PRN person capacity (cfg.prn.max_people)")
        p.add_argument("--no-escalate", action="store_true",
                       help="disable crowd-capacity escalation (saturated "
                            "images truncate with a warning instead of "
                            "re-dispatching at the escalated tier)")
        p.add_argument("--no-refine", action="store_true",
                       help="disable sub-pixel peak refinement "
                            "(cfg.peaks.refine)")
        p.add_argument("--xla-nms", action="store_true",
                       help="use the XLA masked-loop NMS instead of the "
                            "Pallas VMEM kernel (results identical)")
        p.add_argument("--host-grouping", action="store_true",
                       help="run the greedy mutual-best assignment on host "
                            "(reference-exact twin) instead of on device")

    pc = sub.add_parser("coco-eval")
    _common(pc)
    pc.add_argument("--max-images", type=int, default=None)
    pc.add_argument("--result-file", default=None)
    pc.add_argument("--metrics-file", default=None,
                    help="write the 10-stat AP/AR summary as JSON (e.g. for "
                         "the synthetic-E2E regression gate's AP floor)")
    pc.add_argument("--bucket", type=int, default=64,
                    help="shape-bucketing granularity; must match the value "
                         "used with `precompile`")
    _eval_path_flags(pc)
    _cluster_flags(pc)
    pc.add_argument("--eval-shard", default=None, metavar="I:N",
                    help="process only image slice i::n (run one worker per "
                         "chip/host, then `cli merge-results`)")
    pc.set_defaults(fn=cmd_coco_eval)

    pm = sub.add_parser("merge-results")
    pm.add_argument("results", nargs="+",
                    help="per-shard result json files from coco-eval")
    pm.add_argument("--coco-root", default="/data/COCO/")
    pm.add_argument("--max-images", type=int, default=None)
    pm.add_argument("--out", default=None, help="write merged json here")
    pm.set_defaults(fn=cmd_merge_results)

    pp = sub.add_parser("precompile")
    _common(pp)
    pp.add_argument("--shapes", default=None,
                    help="comma-separated HxW original image sizes "
                         "(default: all val2017 person-image sizes)")
    pp.add_argument("--max-images", type=int, default=None)
    pp.add_argument("--bucket", type=int, default=64)
    _eval_path_flags(pp)
    pp.set_defaults(fn=cmd_precompile)

    pb = sub.add_parser("bench")
    pb.set_defaults(fn=cmd_bench)

    pe = sub.add_parser(
        "export-torch",
        help="export an orbax ckpt to the reference PyTorch h5 layout")
    pe.add_argument("ckpt_dir")
    pe.add_argument("out_h5")
    pe.add_argument("--backbone", default="resnet101",
                    choices=["resnet50", "resnet101"])
    pe.add_argument("--epoch", type=int, default=-1)
    pe.set_defaults(fn=cmd_export_torch)

    ph = sub.add_parser(
        "export-stablehlo",
        help="export the fused pose pipeline (weights baked in) as a "
             "serialized StableHLO serving artifact; load with "
             "BatchPredictor.from_exported — no model code or ckpt needed")
    _common(ph)
    ph.add_argument("out", help="output artifact path")
    ph.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated lowering platforms")
    ph.add_argument("--fold-bn", action="store_true",
                    help="fold BN into conv weights before export "
                         "(models/fold_bn.py; exact inference rewrite)")
    ph.set_defaults(fn=cmd_export_stablehlo)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
