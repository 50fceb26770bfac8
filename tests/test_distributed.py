"""Multi-host data parallelism (docs/ROADMAP.md item 6).

The reference has no multi-node story (single-process nn.DataParallel,
SURVEY.md section 2.6).  Ours: jax.distributed + per-host dataset shards +
jax.make_array_from_process_local_data global batch assembly.  The
two-process test runs a REAL jax.distributed cluster over gloo CPU
collectives in subprocesses.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from multiposenet_tpu.data.loader import Loader
from multiposenet_tpu.parallel import distributed as dist


class _DS:
    def __len__(self):
        return 20

    def __getitem__(self, i, rng=None):
        return {"i": np.asarray([i], np.int64)}


def _indices(loader):
    return sorted(int(b["i"][j, 0]) for b in loader
                  for j in range(b["i"].shape[0]))


def test_loader_shards_disjoint_and_exhaustive():
    n_shards = 4
    shards = [Loader(_DS(), batch_size=5, shuffle=True, num_workers=1,
                     shard_id=s, num_shards=n_shards)
              for s in range(n_shards)]
    assert all(len(ld) == 1 for ld in shards)
    all_idx = [i for ld in shards for i in _indices(ld)]
    assert sorted(all_idx) == list(range(20))  # disjoint + exhaustive


def test_loader_shards_equal_length_with_remainder():
    # 20 items over 3 shards -> every shard truncated to 6 (hosts must run
    # the same number of steps or collectives deadlock)
    shards = [Loader(_DS(), batch_size=2, shuffle=False, num_workers=1,
                     shard_id=s, num_shards=3) for s in range(3)]
    lens = [len(_indices(ld)) for ld in shards]
    assert lens == [6, 6, 6]
    assert all(len(ld) == 3 for ld in shards)


def test_loader_shard_validation():
    with pytest.raises(ValueError):
        Loader(_DS(), batch_size=2, shard_id=2, num_shards=2)


def test_per_host_batch_and_single_process_defaults():
    assert dist.process_count() == 1
    assert dist.process_index() == 0
    assert dist.is_primary()
    assert dist.per_host_batch(8) == 8
    # initialize() without a coordinator/cluster env is a no-op
    assert dist.initialize() is False


def test_two_process_cluster():
    """Spawn a real 2-process jax.distributed cluster (gloo collectives)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(worker))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    procs = [subprocess.Popen([sys.executable, worker, str(p), str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for p in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
            assert p.returncode == 0, out[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, mean, seen = line.split(" ", 3)
                results[int(pid)] = (mean, __import__("json").loads(seen.split("=", 1)[1]))
    assert set(results) == {0, 1}, outs
    assert results[0][0] == results[1][0] == "mean=3.5"
    # the two hosts' dataset shards are disjoint and cover 0..15
    assert sorted(results[0][1] + results[1][1]) == list(range(16))


def test_gather_objects_single_process():
    assert dist.gather_objects({"a": [1, 2]}) == [{"a": [1, 2]}]
    # decode=False still participates (no-op here) but returns nothing
    assert dist.gather_objects({"a": [1, 2]}, decode=False) is None


@pytest.mark.parametrize("n_images", [4, 5])
def test_two_process_distributed_coco_eval(tmp_path, n_images):
    """coco-eval on a 2-process cluster with NO explicit shard: the image
    set auto-shards by process, the ragged per-shard results all-gather
    over gloo (gather_objects), and only process 0 scores the merged set
    — one command per host replaces --eval-shard + merge-results.

    n_images=5 pins the UNEVEN case (image count not divisible by process
    count, VERDICT r4 item 6): strided shards of 3 and 2, the ragged
    gather must still merge exhaustively and score all 5."""
    import cv2
    import json

    root = str(tmp_path)
    imgs, anns = [], []
    for i in range(1, n_images + 1):
        cv2.imwrite(os.path.join(root, f"{i}.png"),
                    np.full((64, 80, 3), 40 * i, np.uint8))
        imgs.append({"id": i, "height": 64, "width": 80,
                     "file_name": f"{i}.png"})
        kps = []
        for j in range(17):
            kps += [20 + (j % 5) * 5, 15 + (j // 5) * 8, 2]
        anns.append({"id": i, "image_id": i, "category_id": 1, "iscrowd": 0,
                     "num_keypoints": 17, "area": 900.0,
                     "bbox": [15, 10, 30, 40], "keypoints": kps})
    with open(os.path.join(root, "gt.json"), "w") as f:
        json.dump({"images": imgs, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "mh_eval_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(worker))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(p), str(port), root],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for p in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
            assert p.returncode == 0, out[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, n, ap, ids = line.split(" ", 4)
                results[int(pid)] = (int(n.split("=")[1]),
                                     float(ap.split("=")[1]),
                                     json.loads(ids.split("=", 1)[1]))
    assert set(results) == {0, 1}, outs
    # disjoint exhaustive auto-shard: strided shards balanced to within
    # one image (3+2 in the uneven case), every image covered exactly once
    assert abs(results[0][0] - results[1][0]) <= 1
    assert results[0][0] + results[1][0] == n_images
    assert sorted(results[0][2] + results[1][2]) == list(
        range(1, n_images + 1))
    # primary scores the MERGED set; secondary returns no metrics
    assert results[0][1] > 0.99
    assert results[1][1] == -1.0
    # primary wrote the merged result file
    with open(os.path.join(root, "merged.json")) as f:
        assert len(json.load(f)) == n_images


def test_distributed_coco_eval_shard_failure_no_hang(tmp_path):
    """One shard dies mid-eval: the dead process must still join the
    collective gather (no cluster hang), re-raise its error, and the
    healthy primary must refuse to score the partial result set."""
    import cv2
    import json

    root = str(tmp_path)
    imgs, anns = [], []
    for i in range(1, 5):
        cv2.imwrite(os.path.join(root, f"{i}.png"),
                    np.full((64, 80, 3), 40 * i, np.uint8))
        imgs.append({"id": i, "height": 64, "width": 80,
                     "file_name": f"{i}.png"})
        anns.append({"id": i, "image_id": i, "category_id": 1, "iscrowd": 0,
                     "num_keypoints": 17, "area": 900.0,
                     "bbox": [15, 10, 30, 40],
                     "keypoints": [20, 15, 2] * 17})
    with open(os.path.join(root, "gt.json"), "w") as f:
        json.dump({"images": imgs, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "mh_eval_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(worker))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(p), str(port), root, "fail1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for p in (0, 1)]
    outs = []
    try:
        # the whole point: completes well within the timeout (no hang)
        for p in procs:
            out, _ = p.communicate(timeout=120)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    # both exit nonzero with a surfaced error, not a hang/success
    assert procs[0].returncode == 3, outs[0][-1500:]
    assert procs[1].returncode == 3, outs[1][-1500:]
    assert "RESULT 0 error=RuntimeError" in outs[0]
    assert "RESULT 1 error=RuntimeError" in outs[1]
    assert "refusing to score" in outs[0]   # primary's partial-set refusal
    assert "injected shard failure" in outs[1]  # original error re-raised
