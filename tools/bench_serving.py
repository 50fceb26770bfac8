"""Serving latency benchmark: per-request wall latency through BatchPredictor.

The throughput headline (bench.py) measures a saturated pipelined queue;
a serving deployment cares about the other end: one request arrives, how
long until its person list is back on the host?  This drives
`engine.predictor.BatchPredictor.predict` — host letterbox pack, H2D,
fused forward (+NMS+peaks), batched fetch, PRN grouping tail — and
reports wall-clock latency percentiles per request, plus the
request-batch throughput curve.

The reference has no serving story (its unit of work is a demo script
loading images from disk, evaluate/multipose_test.py); numbers here are
framework capability, not a parity target.

Usage:
  python tools/bench_serving.py [--ckpt DIR] [--bf16] [--requests N]

With --ckpt (e.g. the synthetic-E2E-trained model) detections are real
and the PRN/grouping tail does real work; without it the model is
randomly initialized and the detector keeps ~0 boxes (prior-bias init),
so the tail measures its fixed cost only.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pctl(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="orbax checkpoint dir (best-copy) for real weights")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--backbone", default=None,
                    choices=["resnet50", "resnet101"],
                    help="override cfg.model.backbone (match the ckpt)")
    ap.add_argument("--fold-bn", action="store_true",
                    help="fold trunk BNs into conv weights "
                         "(models/fold_bn.py) before serving")
    ap.add_argument("--requests", type=int, default=30,
                    help="timed single-image requests")
    ap.add_argument("--batch-sizes", default="1,4,8,16")
    ap.add_argument("--exported", default=None,
                    help="serialized StableHLO artifact (cli "
                         "export-stablehlo); serves via "
                         "BatchPredictor.from_exported at the artifact's "
                         "baked batch size (other flags that shape the "
                         "model are ignored — they are baked in)")
    args = ap.parse_args()

    import jax

    # same escape hatch as cli.main: MPN_PLATFORM=cpu pins the backend
    # (JAX_PLATFORMS env can be overridden by sitecustomize config; this
    # cannot).  Must run before first device use.
    plat = os.environ.get("MPN_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    from multiposenet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from multiposenet_tpu.config import Config
    from multiposenet_tpu.engine import checkpoint as ckpt_lib
    from multiposenet_tpu.engine.predictor import BatchPredictor
    from multiposenet_tpu.models.posenet import PoseNet

    if args.exported:
        # AOT artifact: batch size and input resolution are baked in, so
        # bench that one configuration
        pred = BatchPredictor.from_exported(args.exported)
        _run_bench(args, lambda bs: pred, [pred.batch_size], pred.inp,
                   label=f"exported artifact {args.exported}")
        return

    cfg = Config()
    if args.bf16:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           compute_dtype=jnp.bfloat16))
    if args.backbone:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           backbone=args.backbone))
    model = PoseNet(cfg.model)
    size = cfg.eval.inp_size
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3), jnp.float32),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17),
                  jnp.float32),
        method=PoseNet.init_all)
    if args.ckpt:
        variables, stats = ckpt_lib.restore_variables_partial(
            args.ckpt, variables)
        print(f"# loaded {args.ckpt}: {stats}")
    if args.fold_bn:
        from multiposenet_tpu.models.fold_bn import fold_bn_variables
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, fold_bn=True))
        model = PoseNet(cfg.model)
        variables = fold_bn_variables(variables)

    label = (f"{'bf16' if args.bf16 else 'f32'}, "
             f"{'trained' if args.ckpt else 'random'} weights")
    _run_bench(args,
               lambda bs: BatchPredictor(cfg, model, variables,
                                         batch_size=bs),
               [int(b) for b in args.batch_sizes.split(",")], size, label)


def _run_bench(args, make_pred, batch_sizes, size, label):
    # COCO-typical landscape inputs; sizes vary a little so the host pack
    # path (pad-to-square + resize) does real work every request
    rng = np.random.RandomState(0)
    imgs = [
        (rng.rand(480 + 2 * (i % 3), 640, 3) * 255).astype(np.uint8)
        for i in range(64)
    ]

    rows = []
    for bs in batch_sizes:
        pred = make_pred(bs)
        # warmup: compile + first-dispatch costs out of the timed window
        pred.predict(imgs[:bs])
        pred.predict(imgs[bs:2 * bs])

        if bs == 1:
            lat = []
            for i in range(args.requests):
                t0 = time.perf_counter()
                res = pred.predict([imgs[i % len(imgs)]])
                lat.append((time.perf_counter() - t0) * 1e3)
                assert len(res) == 1
            rows.append((bs, pctl(lat, 50), pctl(lat, 95),
                         1e3 / np.mean(lat)))
        else:
            n_req = max(4, args.requests // bs)
            lat = []
            for r in range(n_req):
                chunk = [imgs[(r * bs + j) % len(imgs)] for j in range(bs)]
                t0 = time.perf_counter()
                res = pred.predict(chunk)
                lat.append((time.perf_counter() - t0) * 1e3)
                assert len(res) == bs
            rows.append((bs, pctl(lat, 50), pctl(lat, 95),
                         bs * 1e3 / np.mean(lat)))

    print(f"# serving latency, {label}, ~640x480 inputs -> {size}x{size}")
    print("# batch  p50_ms  p95_ms  img/s")
    for bs, p50, p95, ips in rows:
        print(f"  {bs:5d}  {p50:6.1f}  {p95:6.1f}  {ips:6.1f}")
    one = next((r for r in rows if r[0] == 1), rows[0])
    print(json.dumps({
        "metric": f"serving_p50_latency_batch{one[0]}",
        "value": round(one[1], 1), "unit": "ms",
    }))


if __name__ == "__main__":
    main()
