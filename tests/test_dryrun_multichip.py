"""32-virtual-device dryrun: the mesh logic past the usual n=8.

The driver validates `__graft_entry__.dryrun_multichip` at n=8; this test
stresses the same full surface (per-stage n-dev==1-dev train equivalence +
sharded e2e inference) at n=32 with b=2n=64 — four device-rows more than
any mesh the suite otherwise builds, so shard-shape or collective-layout
assumptions tied to 8 can't hide (VERDICT r4 item 6; no reference analog —
the rebuild's own SURVEY §2.6 charter, hence self-tested).

Runs in a subprocess: the in-process backend is pinned to 8 CPU devices by
conftest, and jax can't re-init device count after first use.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_32_devices():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 32)\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(32, size=32)\n"
    )
    # 32 virtual CPU devices compile ~10-20 min clean; leave headroom for
    # CI contention (observed: 1800 s was not enough alongside a gate run)
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=3600)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "dryrun_multichip(32):" in out.stdout
    assert "32-dev == 1-dev" in out.stdout
    assert "batch 64 over 32 devices" in out.stdout
