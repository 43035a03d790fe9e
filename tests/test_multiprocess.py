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


_TRAIN_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
rank = int(sys.argv[1]); size = int(sys.argv[2])
coord = sys.argv[3]; outdir = sys.argv[4]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=size, process_id=rank)
sys.path.insert(0, os.getcwd())
sys.path.insert(0, os.path.join(os.getcwd(), "tests"))

import numpy as np
import jax.numpy as jnp
import pickle

from mp_train_common import make_cfg, make_global_batch
from wsovod_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from wsovod_tpu.data.loader import build_detection_train_loader
from wsovod_tpu.engine.train_loop import create_train_state, make_train_step
from wsovod_tpu.models import build_model
from wsovod_tpu.parallel.distributed import all_gather_objects, to_global_batch
from wsovod_tpu.parallel.mesh import create_mesh, replicate
from wsovod_tpu.solver.build import build_optimizer

with open(os.path.join(outdir, "ds.pkl"), "rb") as f:
    ds = pickle.load(f)
name = "_mp_train_synth"
if name not in DatasetCatalog.list():
    DatasetCatalog.register(name, lambda: ds["dicts"])
    MetadataCatalog.get(name).set(thing_classes=["red", "blue"], evaluator_type="coco")
cfg = make_cfg(name, ds["prop_path"])

# (a) the world-2 loader seam: both hosts must emit the SAME batch shape
# (the single-bucket collapse, data/loader.py:160-165) and the divisibility
# assert must pass at IMS_PER_BATCH=2 / 2 hosts
loader = build_detection_train_loader(cfg)
local = next(loader)
shapes = {k: tuple(np.asarray(v).shape) for k, v in local.items()
          if isinstance(v, np.ndarray)}
gathered = all_gather_objects(shapes)
assert gathered[0] == gathered[1], gathered

# (b) deterministic global batch -> local slice -> to_global_batch ->
# one jitted step on the 2-process x 1-device mesh
full = make_global_batch()
local_batch = {k: v[rank::size] for k, v in full.items()}

model = build_model(cfg)
emb = jnp.asarray(np.random.RandomState(1).randn(2, 8).astype(np.float32))
mesh = create_mesh((2,), ("data",))
init_batch = {k: jnp.asarray(v) for k, v in local_batch.items()}
variables = model.init(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
    init_batch, train=True, iteration=jnp.asarray(0, jnp.int32),
    rng=jax.random.PRNGKey(2), embeddings=emb,
)
tx = build_optimizer(cfg, variables["params"])
state = create_train_state(variables, tx, jax.random.PRNGKey(3))
state = replicate(state, mesh)
emb_r = replicate(emb, mesh)
step = make_train_step(model, tx, mesh=mesh)
global_batch = to_global_batch(
    {k: jnp.asarray(v) for k, v in local_batch.items()}, mesh
)
with mesh:
    state, metrics = step(state, global_batch, emb_r)
loss = float(jax.device_get(metrics["total_loss"]))
assert np.isfinite(loss)
if rank == 0:
    with open(os.path.join(outdir, "train_result.json"), "w") as f:
        json.dump({"loss": loss}, f)
with open(os.path.join(outdir, f"tdone_{rank}"), "w") as f:
    f.write("ok")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step(tmp_path):
    """Real 2-process TRAIN step (VERDICT r3 #7): each host builds the tiny
    train state, loads one world-2 loader batch (single-bucket collapse +
    divisibility assert, data/loader.py:153-165), forms the global batch via
    ``to_global_batch`` (host_local_array_to_global_array), and runs one
    jitted step on a 2-process x 1-device mesh. The loss must match a
    single-process run on the same global batch."""
    import pickle

    sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
    from synth_data import make_synth_dataset

    name, prop_path = make_synth_dataset(tmp_path, "_mp_train_synth_parent")
    from wsovod_tpu.data.catalog import DatasetCatalog

    with open(tmp_path / "ds.pkl", "wb") as f:
        pickle.dump(
            {"dicts": DatasetCatalog.get("_mp_train_synth_parent"),
             "prop_path": prop_path},
            f,
        )

    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)
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
    dist_loss = json.loads((tmp_path / "train_result.json").read_text())["loss"]

    # single-process reference on the same global batch / params / rngs
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mp_train_common import make_cfg, make_global_batch
    from wsovod_tpu.engine.train_loop import create_train_state, make_train_step
    from wsovod_tpu.models import build_model
    from wsovod_tpu.solver.build import build_optimizer

    cfg = make_cfg(name, prop_path)
    model = build_model(cfg)
    emb = jnp.asarray(np.random.RandomState(1).randn(2, 8).astype(np.float32))
    batch = {k: jnp.asarray(v) for k, v in make_global_batch().items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True, iteration=jnp.asarray(0, jnp.int32),
        rng=jax.random.PRNGKey(2), embeddings=emb,
    )
    tx = build_optimizer(cfg, variables["params"])
    state = create_train_state(variables, tx, jax.random.PRNGKey(3))
    step = make_train_step(model, tx)
    _, metrics = step(state, batch, emb)
    ref_loss = float(metrics["total_loss"])
    assert abs(dist_loss - ref_loss) < 1e-4 * max(1.0, abs(ref_loss)), (
        dist_loss, ref_loss,
    )


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
