"""Assert an OKS-AP floor (and zero capacity truncation) on a gate run.

The synthetic E2E gate's pass/fail checks (tools/synth_e2e_gate.sh),
factored out so the gate's regression-detection logic is unit-testable
(tests/test_synth_dataset.py):

- a metrics file carrying an AP below the floor must exit non-zero;
- a coco-eval log carrying any WARNING-level capacity-truncation line
  must exit non-zero.  Escalation (cfg.peaks.escalate_max_peaks /
  cfg.prn.escalate_max_people) re-dispatches saturated crowd images at a
  bigger tier, so under the gate truncation is impossible by design —
  any "dropped ... capacity" / "may have truncated" WARNING means output
  differed from the reference's unbounded processing (tester.py:338-350,
  400-406).  INFO "re-dispatching"/"escalating" lines are the intended
  escalation path and do not fail.

The reference's analogous oracle is its published AP table (reference
README.md:38-51).

Usage: python tools/check_ap_floor.py METRICS_JSON FLOOR [COCO_EVAL_LOG]
"""

import json
import re
import sys

# WARNING-level truncation markers (engine/evaluator.py warning sites).
# Anchored on this package's logger name (utils/logging.py format:
# "... WARNING multiposenet_tpu: ...") so a third-party WARNING line that
# happens to contain one of the words cannot fail the gate.
TRUNCATION_RE = re.compile(
    r"WARNING\s+multiposenet_tpu.*(dropped|truncated|saturated)")


def check(metrics_path: str, floor: float) -> bool:
    with open(metrics_path) as f:
        m = json.load(f)
    ap = float(m.get("AP", -1.0))
    ok = ap >= floor
    print(f"synth-E2E gate: AP={ap:.3f} floor={floor:g} -> "
          f"{'PASS' if ok else 'FAIL'}")
    return ok


def check_no_truncation(log_path: str) -> bool:
    bad = []
    with open(log_path, errors="replace") as f:
        for line in f:
            if TRUNCATION_RE.search(line):
                bad.append(line.rstrip())
    if bad:
        print("synth-E2E gate: FAIL — capacity truncation under "
              "escalation:", file=sys.stderr)
        for line in bad:
            print("  " + line, file=sys.stderr)
        return False
    print("synth-E2E gate: zero capacity-truncation warnings")
    return True


def main(argv) -> int:
    ok = check(argv[0], float(argv[1]))
    if len(argv) > 2:
        ok = check_no_truncation(argv[2]) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
