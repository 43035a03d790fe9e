"""Real n>1 multi-process coverage: 2 CPU processes under
``jax.distributed.initialize`` exercise (a) unequal-size object all-gather
and (b) sharded COCO eval reproducing single-process metrics exactly.

The byte-padding/size-exchange in ``all_gather_objects`` and the evaluator's
rank-merge are exactly the code that only breaks at world > 1 (round-2
verdict); reference behavior: d2 ``comm.gather`` in
``wsovod/evaluation/coco_evaluation.py:182-188``.
"""

import json
import os
import socket
import subprocess
import sys

_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
# each process must see exactly one local CPU device for a clean 2-device world
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
rank = int(sys.argv[1]); size = int(sys.argv[2])
coord = sys.argv[3]; outdir = sys.argv[4]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=size, process_id=rank)
sys.path.insert(0, os.getcwd())  # repo root (the parent test sets cwd)

from wsovod_tpu.parallel.distributed import all_gather_objects, is_main_process

# (a) unequal-size payload round-trip
payload = {"rank": rank, "blob": "x" * (100 + 900 * rank), "l": list(range(rank + 3))}
gathered = all_gather_objects(payload)
assert len(gathered) == size, gathered
for r in range(size):
    assert gathered[r]["rank"] == r
    assert gathered[r]["blob"] == "x" * (100 + 900 * r)

# (b) sharded eval == single-process eval
import numpy as np
from wsovod_tpu.data.catalog import MetadataCatalog
from wsovod_tpu.evaluation.coco_evaluation import COCOEvaluator

name = "mp_eval_ds"
if name not in MetadataCatalog.list():
    MetadataCatalog.get(name).set(thing_classes=["a", "b"], evaluator_type="coco")

rng = np.random.RandomState(0)
images = list(range(8))
gt, preds = {}, {}
for img in images:
    n = 2 + img % 3
    b = rng.uniform(0, 50, (n, 2))
    boxes = np.concatenate([b, b + rng.uniform(5, 30, (n, 2))], axis=1)
    cls = rng.randint(0, 2, n)
    gt[img] = (boxes, cls)
    jitter = rng.uniform(-2, 2, boxes.shape)
    preds[img] = (boxes + jitter, rng.uniform(0.2, 1.0, n), cls)

def feed(ev, shard_images):
    for img in images:  # GT registered in full on every host
        ev.process_gt(img, gt[img][0], gt[img][1])
    for img in shard_images:
        ev.process_proposals(img, preds[img][0], np.ones(len(preds[img][0])))
        ev.process(img, *preds[img])

ev = COCOEvaluator(name)
feed(ev, images[rank::size])  # this rank's shard only
res = ev.evaluate()
if is_main_process():
    # single-process reference on the full set (no distributed path: the
    # evaluator is fresh and _gathered stays unset only via process_count;
    # compute it manually by disabling gather)
    ev_ref = COCOEvaluator(name)
    feed(ev_ref, images)
    ev_ref._gathered = True  # skip the distributed merge: local-only
    want = ev_ref.evaluate()
    assert res.keys() == want.keys(), (res.keys(), want.keys())
    import math
    for k in want["bbox"]:
        a, b = res["bbox"][k], want["bbox"][k]
        same = (math.isnan(a) and math.isnan(b)) or abs(a - b) < 1e-9
        assert same, (k, a, b)
    for k in want["box_proposals"]:
        assert abs(res["box_proposals"][k] - want["box_proposals"][k]) < 1e-9, k
    with open(os.path.join(outdir, "result.json"), "w") as f:
        json.dump({"ok": True, "AP50": want["bbox"]["AP50"]}, f)
else:
    assert res == {}, "non-main process must report {}"
with open(os.path.join(outdir, f"done_{rank}"), "w") as f:
    f.write("ok")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gather_and_sharded_eval(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(r), "2", coord, str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for r in range(2)
    ]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for r, p in enumerate(procs):
        assert p.returncode == 0, f"rank {r} failed:\n{outs[r]}"
    assert (tmp_path / "done_0").exists() and (tmp_path / "done_1").exists()
    result = json.loads((tmp_path / "result.json").read_text())
    assert result["ok"] is True
