"""Shared config/batch builders for the 2-process train-step test.

Imported by both the parent test (single-process reference) and the spawned
workers, so the model/params/batch are bit-identical across the three
processes."""

import numpy as np

import jax.numpy as jnp

from wsovod_tpu.config import get_cfg


def make_cfg(name, prop_path):
    cfg = get_cfg()
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.DATASETS.PROPOSAL_FILES_TRAIN = (prop_path,)
    cfg.DATASETS.PROPOSAL_FILES_TEST = (prop_path,)
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = 12
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 12
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 8
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_DIM = 8
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.DATA_AWARE = True
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_NUM = 1
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_REG = [True]
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.CROP.ENABLED = False
    cfg.SOLVER.IMS_PER_BATCH = 2  # 1 per host at world 2
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.WARMUP_ITERS = 1
    cfg.TPU.PROPOSAL_PAD = 16
    cfg.TPU.MAX_GT_PAD = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def make_global_batch():
    """Deterministic full global batch (B=2); host r slices row r."""
    rng = np.random.RandomState(7)
    b, s, g, size = 2, 12, 4, 64
    boxes = rng.uniform(0, size * 0.6, (b, s, 2))
    boxes = np.concatenate([boxes, boxes + rng.uniform(8, 20, (b, s, 2))], -1)
    return {
        "images": rng.uniform(0, 255, (b, size, size, 3)).astype(np.float32),
        "image_sizes": np.array([[size, size]] * b, np.int32),
        "sam_boxes": boxes.astype(np.float32),
        "sam_scores": rng.uniform(0.5, 1, (b, s)).astype(np.float32),
        "sam_valid": np.ones((b, s), bool),
        "gt_classes": rng.randint(0, 2, (b, g)),
        "gt_valid": np.array([[True, True, False, False]] * b),
    }
