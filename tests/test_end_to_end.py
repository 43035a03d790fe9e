"""End-to-end slice: synthetic VOC-style dataset -> a few train steps ->
evaluation through the full test_WSL driver. Everything tiny, CPU."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsovod_tpu.config import get_cfg


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    from synth_data import make_synth_dataset

    root = tmp_path_factory.mktemp("synth")
    return make_synth_dataset(root, "_e2e_synth", evaluator_type="pascal_voc")


def _cfg(name, prop_path):
    cfg = get_cfg()
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.DATASETS.PROPOSAL_FILES_TRAIN = (prop_path,)
    cfg.DATASETS.PROPOSAL_FILES_TEST = (prop_path,)
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = 12
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 12
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 1e-5
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 8
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 8
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_DIM = 8
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.DATA_AWARE = True
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_NUM = 1
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_REG = [True]
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.INPUT.CROP.ENABLED = False
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.WARMUP_ITERS = 1
    cfg.TPU.PROPOSAL_PAD = 16
    cfg.TPU.MAX_GT_PAD = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_train_steps_and_eval(synth_dataset):
    name, prop_path = synth_dataset
    cfg = _cfg(name, prop_path)

    from wsovod_tpu.data.loader import build_detection_train_loader
    from wsovod_tpu.engine.evaluator import test_WSL
    from wsovod_tpu.engine.train_loop import create_train_state, make_train_step
    from wsovod_tpu.models import build_model
    from wsovod_tpu.solver.build import build_optimizer

    model = build_model(cfg)
    loader = build_detection_train_loader(cfg)
    batch = next(loader)
    keys = ("images", "image_sizes", "sam_boxes", "sam_scores", "sam_valid",
            "gt_classes", "gt_valid")
    device_batch = {k: jnp.asarray(batch[k]) for k in keys}

    emb = jnp.asarray(np.random.RandomState(1).randn(2, 8).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        device_batch, train=True, iteration=jnp.asarray(0, jnp.int32),
        rng=jax.random.PRNGKey(2), embeddings=emb,
    )
    tx = build_optimizer(cfg, variables["params"])
    # snapshot before stepping: the train step donates the state buffers
    d0 = float(
        sum(
            np.abs(np.asarray(l)).sum()
            for l in jax.tree_util.tree_leaves(variables["params"])
        )
    )
    state = create_train_state(variables, tx, jax.random.PRNGKey(3))
    step = make_train_step(model, tx)

    losses = []
    for it in range(3):
        state, metrics = step(state, device_batch, emb)
        total = float(metrics["total_loss"])
        assert np.isfinite(total)
        losses.append(total)
        device_batch = {k: jnp.asarray(b[k]) for b in [next(loader)] for k in keys}

    # params actually changed
    d1 = float(
        sum(
            np.abs(np.asarray(l)).sum()
            for l in jax.tree_util.tree_leaves(
                state.params["params"] if "params" in state.params else state.params
            )
        )
    )
    assert abs(d0 - d1) > 1e-6

    # full evaluation driver
    results = test_WSL(cfg, model, state.params, embeddings=emb)
    res = results[name]["bbox"]
    assert "AP50" in res and "CorLoc50" in res
    assert np.isfinite(res["AP50"])


def test_vis_period_and_vis_test_dumps(synth_dataset, tmp_path):
    """VIS_PERIOD / VIS_TEST wiring (reference roi_heads.py:1345-1564):
    the train step's sown pseudo-GT renders to PNGs and the eval path dumps
    per-image proposal .npy files."""
    name, prop_path = synth_dataset
    cfg = _cfg(name, prop_path)
    cfg.VIS_PERIOD = 1
    cfg.VIS_TEST = True
    cfg.OUTPUT_DIR = str(tmp_path)

    from wsovod_tpu.data.loader import build_detection_train_loader
    from wsovod_tpu.engine.evaluator import test_WSL
    from wsovod_tpu.engine.train_loop import create_train_state, make_train_step
    from wsovod_tpu.engine.trainer import WSOVODTrainer
    from wsovod_tpu.models import build_model
    from wsovod_tpu.solver.build import build_optimizer

    model = build_model(cfg)
    loader = build_detection_train_loader(cfg)
    batch = next(loader)
    keys = ("images", "image_sizes", "sam_boxes", "sam_scores", "sam_valid",
            "gt_classes", "gt_valid")
    device_batch = {k: jnp.asarray(batch[k]) for k in keys}
    emb = jnp.asarray(np.random.RandomState(1).randn(2, 8).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        device_batch, train=True, iteration=jnp.asarray(0, jnp.int32),
        rng=jax.random.PRNGKey(2), embeddings=emb,
    )
    tx = build_optimizer(cfg, variables["params"])
    state = create_train_state(variables, tx, jax.random.PRNGKey(3))
    step = make_train_step(model, tx, with_vis=True)
    state, metrics, vis = step(state, device_batch, emb)
    assert np.isfinite(float(metrics["total_loss"]))

    # the sown pgt reaches the host-side renderer and produces PNGs
    class _T:
        pass

    t = _T()
    t.cfg = cfg
    WSOVODTrainer._dump_vis(t, 0, device_batch, vis)
    import glob

    pngs = glob.glob(os.path.join(cfg.OUTPUT_DIR, "vis_pgt*", "*.png"))
    assert pngs, "VIS_PERIOD produced no pseudo-GT PNGs"

    # VIS_TEST: eval dumps per-image proposal npy pairs
    test_WSL(cfg, model, state.params, embeddings=emb)
    npys = glob.glob(os.path.join(cfg.OUTPUT_DIR, "proposals_test", "*.npy"))
    assert npys, "VIS_TEST produced no proposal npy dumps"


def test_param_group_labels(synth_dataset):
    name, prop_path = synth_dataset
    cfg = _cfg(name, prop_path)
    cfg.MODEL.BACKBONE.FREEZE_AT = 5

    from wsovod_tpu.models import build_model
    from wsovod_tpu.solver.build import param_labels

    model = build_model(cfg)
    batch = {
        "images": jnp.zeros((1, 64, 64, 3)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "sam_boxes": jnp.zeros((1, 4, 4)),
        "sam_scores": jnp.zeros((1, 4)),
        "sam_valid": jnp.ones((1, 4), bool),
    }
    emb = jnp.zeros((2, 8))
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False,
                           embeddings=emb)
    labels = param_labels(variables["params"], freeze_at=5)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    lab = {jax.tree_util.keystr(kp): v for kp, v in flat}
    backbone_labels = {v for k, v in lab.items() if "backbone" in k}
    assert backbone_labels == {"frozen"}
    head_bias = [v for k, v in lab.items() if "box_head" in k and "bias" in k]
    assert set(head_bias) == {"bias"}


def test_mixed_datasets_model_two_sources():
    """Mixed-dataset meta-arch: one compiled program per dataset_id, shared
    refineries, per-family miners, per-dataset class counts."""
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN_WSOVOD_MixedDatasets"
    cfg.DATASETS.MIXED_DATASETS.NAMES = ["voc_x", "coco_x"]
    cfg.DATASETS.MIXED_DATASETS.NUM_CLASSES = [3, 5]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 8
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_DIM = 8
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_NUM = 1
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_REG = [True]
    cfg.TPU.COMPUTE_DTYPE = "float32"

    from wsovod_tpu.models import build_model

    model = build_model(cfg)
    rng = np.random.RandomState(0)
    boxes = rng.uniform(0, 40, (1, 8, 2))
    batch = {
        "images": jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "sam_boxes": jnp.asarray(
            np.concatenate([boxes, boxes + 15], -1).astype(np.float32)
        ),
        "sam_scores": jnp.asarray(rng.uniform(0.5, 1, (1, 8)).astype(np.float32)),
        "sam_valid": jnp.ones((1, 8), bool),
        "gt_classes": jnp.asarray([[0, 1]]),
        "gt_valid": jnp.ones((1, 2), bool),
    }
    emb_voc = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    emb_coco = jnp.asarray(rng.randn(5, 8).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True, iteration=jnp.asarray(0, jnp.int32),
        rng=jax.random.PRNGKey(2), embeddings=emb_voc, source_id=0,
    )
    # both miners exist
    miners = [k for k in params["params"]["roi_heads"] if k.startswith("object_miner")]
    assert len(miners) == 2

    for sid, emb in [(0, emb_voc), (1, emb_coco)]:
        losses = model.apply(
            params, batch, train=True, iteration=jnp.asarray(0, jnp.int32),
            rng=jax.random.PRNGKey(3), embeddings=emb, source_id=sid,
            rngs={"dropout": jax.random.PRNGKey(4)},
        )
        assert np.isfinite(float(sum(jnp.asarray(v) for v in losses.values())))


def test_cli_train_resume_continues(synth_dataset, tmp_path):
    """--resume (reference tools/train_net.py:71): a killed run restarted
    with resume=True continues from the last checkpoint — step counter and
    optimizer state carry over instead of restarting."""
    from wsovod_tpu.engine.trainer import WSOVODTrainer

    name, prop_path = synth_dataset
    cfg = _cfg(name, prop_path)
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_PATH_TRAIN = "rand"
    cfg.TPU.MESH_SHAPE = [2]  # B=2 on the 8-device CPU test mesh
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.CHECKPOINT_PERIOD = 1000  # rely on model_final

    t1 = WSOVODTrainer(cfg)
    s1 = t1.train()
    assert int(s1.step) == 3

    cfg2 = _cfg(name, prop_path)
    cfg2.OUTPUT_DIR = str(tmp_path)
    cfg2.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_PATH_TRAIN = "rand"
    cfg2.TPU.MESH_SHAPE = [2]  # B=2 on the 8-device CPU test mesh
    cfg2.SOLVER.MAX_ITER = 5
    cfg2.SOLVER.CHECKPOINT_PERIOD = 1000
    t2 = WSOVODTrainer(cfg2, resume=True)
    assert t2.resumed, "resume=True did not pick up the checkpoint"
    assert int(t2.state.step) == 3, "step counter restarted instead of resuming"
    # optimizer state carried over: momentum buffers are nonzero (a fresh
    # optax init is all zeros)
    mom = sum(
        float(np.abs(np.asarray(l)).sum())
        for l in jax.tree_util.tree_leaves(t2.state.opt_state)
        if hasattr(l, "dtype") and np.issubdtype(np.asarray(l).dtype, np.floating)
    )
    assert mom > 0.0, "optimizer state restarted (all-zero momentum)"
    s2 = t2.train()
    assert int(s2.step) == 5

    # and a FRESH (no-resume) trainer in the same dir restarts from 0
    cfg3 = _cfg(name, prop_path)
    cfg3.OUTPUT_DIR = str(tmp_path)
    cfg3.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_PATH_TRAIN = "rand"
    cfg3.TPU.MESH_SHAPE = [2]  # B=2 on the 8-device CPU test mesh
    t3 = WSOVODTrainer(cfg3, resume=False)
    assert not t3.resumed and int(t3.state.step) == 0


def test_cli_eval_only_tta_verify(synth_dataset, tmp_path, monkeypatch):
    """--eval-only with TEST.AUG.ENABLED dispatches the TTA pass (results
    keyed name_TTA) and runs verify_results against TEST.EXPECTED_RESULTS
    (reference tools/train_net.py:58-62)."""
    import importlib.util
    import argparse

    name, prop_path = synth_dataset
    cfg = _cfg(name, prop_path)
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_PATH_TRAIN = "rand"
    cfg.TPU.MESH_SHAPE = [2]  # B=2 on the 8-device CPU test mesh
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (48, 64)
    cfg.TEST.AUG.MAX_SIZE = 96
    cfg.TEST.AUG.FLIP = True
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    # an impossible expectation must be DETECTED (verify_results returns
    # False) without crashing the eval
    cfg.TEST.EXPECTED_RESULTS = [["bbox", "AP50", 200.0, 0.0]]

    spec = importlib.util.spec_from_file_location(
        "wsovod_train_net", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "train_net.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "setup", lambda args: cfg)

    args = argparse.Namespace(
        config_file="", eval_only=True, resume=False, num_gpus=0,
        num_machines=1, machine_rank=0, dist_url="auto", opts=[],
    )
    results = mod.main(args)
    assert name in results and (name + "_TTA") in results
    assert np.isfinite(results[name]["bbox"]["AP50"])
    assert np.isfinite(results[name + "_TTA"]["bbox"]["AP50"])
