"""AP-evidence ablation matrix (VERDICT r3 item 1).

Runs the FULL coco-eval protocol once per eval-path toggle on a trained
checkpoint (normally the synth gate's stage-3 best) and reports each
toggle's AP/AP50 delta against the all-defaults run — converting every
"numerics-only" default (bf16 off, fold_bn off, device resize/peaks on,
Pallas NMS, device grouping, peak refine) into protocol-level AP evidence.
Reference protocol being matched: /root/reference/evaluate/tester.py:131-193.

With --assert-tol the script exits non-zero if any toggle marked
`bounded` moves AP by more than the tolerance — the synth gate runs it in
that mode so a regression in any path variant fails the gate.

Usage:
  python tools/ap_ablation.py --coco-root ROOT --ckpt CKPT \
      [--backbone resnet50] [--out-dir /tmp/mpn_ablation] \
      [--assert-tol 0.02] [--only name,name]

Writes per-toggle metrics json + an `ablation_table.md` under --out-dir
and prints the table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

# (name, extra CLI flags, bounded: asserted |dAP| <= tol when --assert-tol).
# The host chain replicates the reference's exact host implementations —
# it is the strongest equivalence check, bounded too.
TOGGLES = [
    ("default", [], False),
    ("bf16", ["--bf16"], True),
    ("fold_bn", ["--fold-bn"], True),
    ("host_chain", ["--host-resize", "--host-peaks", "--host-image-resize",
                    "--host-grouping"], True),
    ("xla_nms", ["--xla-nms"], True),
    ("host_grouping", ["--host-grouping"], True),
    ("no_refine", ["--no-refine"], False),  # refine is a real AP lever in
                                            # the reference too; reported,
                                            # not bounded
]

# Toggles whose path claims BIT-identical protocol output, not just a
# bounded AP delta: the Pallas and XLA NMS run the same suppression math
# on the same operands (ops/nms.py vs ops/pallas_nms.py, results
# identical by construction and by fuzz tests).  With --assert-tol these
# must match the default run's summary stats EXACTLY (measured so on the
# 2026-08-20 gate run).  host_grouping matched exactly there too but
# stays tolerance-bounded: a razor score-tie can legitimately order two
# people differently between the device and host greedy assignments.
EXACT = {"xla_nms"}


def run_eval(repo, args, name, flags, out_dir):
    metrics = os.path.join(out_dir, f"metrics_{name}.json")
    cmd = [sys.executable, "-m", "multiposenet_tpu.cli", "coco-eval",
           "--coco-root", args.coco_root, "--backbone", args.backbone,
           "--ckpt", args.ckpt,
           "--result-file", os.path.join(out_dir, f"results_{name}.json"),
           "--metrics-file", metrics] + flags
    if args.max_images:
        cmd += ["--max-images", str(args.max_images)]
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    print(f"== ablation '{name}': {' '.join(flags) or '(defaults)'}",
          flush=True)
    r = subprocess.run(cmd, env=env)
    if r.returncode:
        raise RuntimeError(f"ablation '{name}' failed (rc {r.returncode})")
    with open(metrics) as f:
        return json.load(f)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coco-root", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--out-dir", default="/tmp/mpn_ablation")
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--assert-tol", type=float, default=None,
                    help="fail if a bounded toggle moves AP more than this")
    ap.add_argument("--only", default=None,
                    help="comma-separated toggle names to run (plus "
                         "'default', always run)")
    args = ap.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(args.out_dir, exist_ok=True)
    only = set(args.only.split(",")) | {"default"} if args.only else None

    rows, table = {}, []
    for name, flags, bounded in TOGGLES:
        if only and name not in only:
            continue
        rows[name] = (run_eval(repo, args, name, flags, args.out_dir),
                      bounded)

    base = rows["default"][0]
    lines = ["| toggle | AP | dAP | AP50 | dAP50 | bounded |",
             "|---|---|---|---|---|---|"]
    failures = []
    for name, flags, bounded in TOGGLES:
        if name not in rows:
            continue
        m = rows[name][0]
        ap_v, ap50 = float(m.get("AP", -1)), float(m.get("AP50", -1))
        dap = ap_v - float(base.get("AP", -1))
        dap50 = ap50 - float(base.get("AP50", -1))
        lines.append(f"| {name} | {ap_v:.4f} | {dap:+.4f} | {ap50:.4f} "
                     f"| {dap50:+.4f} | {'yes' if bounded else 'no'} |")
        if (args.assert_tol is not None and bounded
                and abs(dap) > args.assert_tol):
            failures.append((name, dap))
        if args.assert_tol is not None and name in EXACT and m != base:
            diff_keys = sorted(k for k in set(m) | set(base)
                               if m.get(k) != base.get(k))
            failures.append((name, f"not protocol-identical: {diff_keys}"))
    table = "\n".join(lines)
    print(table)
    with open(os.path.join(args.out_dir, "ablation_table.md"), "w") as f:
        f.write(table + "\n")

    if failures:
        bounded_f = [f for f in failures if not isinstance(f[1], str)]
        exact_f = [f for f in failures if isinstance(f[1], str)]
        if bounded_f:
            print("FAIL: bounded toggles moved AP beyond "
                  f"{args.assert_tol}: {bounded_f}")
        if exact_f:
            print("FAIL: EXACT toggles must be protocol-identical "
                  f"(every summary stat equal), but: {exact_f}")
        return 1
    if args.assert_tol is not None:
        print(f"PASS: all bounded toggles within |dAP| <= {args.assert_tol}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
