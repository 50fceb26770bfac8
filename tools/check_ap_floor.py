"""Assert an OKS-AP floor on a coco-eval --metrics-file json.

The synthetic E2E gate's final pass/fail check (tools/synth_e2e_gate.sh),
factored out so the gate's regression-detection logic is unit-testable
(tests/test_synth_dataset.py): a metrics file carrying an AP below the floor
must exit non-zero.  The reference's analogous oracle is its published AP
table (reference README.md:38-51).

Usage: python tools/check_ap_floor.py METRICS_JSON FLOOR
"""

import json
import sys


def check(metrics_path: str, floor: float) -> bool:
    with open(metrics_path) as f:
        m = json.load(f)
    ap = float(m.get("AP", -1.0))
    ok = ap >= floor
    print(f"synth-E2E gate: AP={ap:.3f} floor={floor:g} -> "
          f"{'PASS' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    sys.exit(0 if check(sys.argv[1], float(sys.argv[2])) else 1)
