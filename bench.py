"""End-to-end inference benchmark: images/sec/chip on the flagship model.

Measures the fused full pipeline (preprocess -> ResNet-101 FPN -> keypoint
heatmaps + RetinaNet heads -> anchor decode -> NMS -> heatmap peaks) on one
chip at 480x480, the reference demo configuration
(reference evaluate/multipose_test.py + tester.py:195-254).

Activations run in bfloat16 — the TPU-native inference dtype (+21% over f32
on v5e; parameters and parity-critical small ops stay float32, see
docs/PERF.md).  Set MPN_BENCH_F32=1 for the float32 number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md
section 6), so the denominator is MEASURED on this same chip by
tools/bench_reference_shaped.py (2026-08-17, v5e via axon): the
reference's per-image serialization pattern — batch 1, one dispatch per
image, full heatmap fetched to host, host peak finding, host grouping —
driven through this framework's f32 graph runs at **5.93 img/s
(168.5 ms/image)**.  That measurement hands the reference every advantage
it doesn't have (fused XLA forward, one batched PRN dispatch instead of
one per person, no cv2 preprocess), so the true torch pipeline would be
strictly slower; dividing by it is conservative.  It also happens to
bracket the 10 img/s circa-2018-GPU estimate round 1 used.
BASELINE.json's target is >= 10x the reference per chip.
"""

import json
import time

import numpy as np

# measured by tools/bench_reference_shaped.py on this hardware — see
# module docstring for the derivation and why it is conservative
REFERENCE_IMAGES_PER_SEC = 5.93


def main():
    import dataclasses
    import os

    import jax

    from multiposenet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    from multiposenet_tpu.config import Config
    from multiposenet_tpu.models.posenet import PoseNet
    from multiposenet_tpu.engine.inference import make_full_pipeline

    cfg = Config()
    if os.environ.get("MPN_BENCH_F32") != "1":
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           compute_dtype=jnp.bfloat16))
    model = PoseNet(cfg.model)
    size = cfg.data.inp_size
    batch = 64  # per-chip inference batch (throughput sweet spot, docs/PERF.md)

    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng,
        jnp.zeros((1, size, size, 3), jnp.float32),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17), jnp.float32),
        method=PoseNet.init_all,
    )
    pipeline = make_full_pipeline(model, cfg, (size, size))

    imgs = jnp.asarray(
        (np.random.RandomState(0).rand(batch, size, size, 3) * 255).astype(np.uint8))

    # warmup + compile (consume results: on the axon remote runtime a bare
    # block_until_ready does not reliably wait for execution)
    out = pipeline(params, imgs)
    float(out.detections.scores[0, 0])

    # enqueue all iterations, then fetch EVERY output's detection scores in
    # one batched device_get — every execution is materialized on the host
    # (nothing can be elided) and the tunnel round-trip amortizes across
    # the queue instead of serializing per call
    iters = 20
    t0 = time.perf_counter()
    outs = [pipeline(params, imgs) for _ in range(iters)]
    fetched = jax.device_get([o.detections.scores for o in outs])
    assert len(fetched) == iters and fetched[0].shape[0] == batch
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    print(json.dumps({
        "metric": "images_per_sec_per_chip_e2e_inference",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REFERENCE_IMAGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
