"""Build a tiny synthetic VOC2007 dataset + proposals + embeddings in /tmp
and emit a tiny config yaml, for driving tools/train_net.py end-to-end on CPU.

Usage: python scripts/verify_cli.py [dest_root]
Prints the config path; then run e.g.
  WSOVOD_DATASETS=<root> python tools/train_net.py --config-file <cfg>
"""

import os
import pickle
import sys

import numpy as np


def build(root="/tmp/verify_ds"):
    import cv2

    voc = os.path.join(root, "VOC2007")
    for d in ("JPEGImages", "Annotations", os.path.join("ImageSets", "Main")):
        os.makedirs(os.path.join(voc, d), exist_ok=True)
    rng = np.random.RandomState(0)
    ids, pboxes, pscores = [], [], []
    classes = ["aeroplane", "bicycle"]
    names = []
    for i in range(4):
        h, w = 72, 96
        img = rng.randint(0, 120, (h, w, 3), np.uint8)
        x1, y1 = rng.randint(5, 30), rng.randint(5, 20)
        x2, y2 = x1 + rng.randint(20, 40), y1 + rng.randint(20, 35)
        img[y1:y2, x1:x2] = [250, 120, 30]
        name = f"{i:06d}"
        names.append(name)
        cv2.imwrite(os.path.join(voc, "JPEGImages", f"{name}.jpg"), img)
        cls = classes[i % 2]
        with open(os.path.join(voc, "Annotations", f"{name}.xml"), "w") as f:
            f.write(
                f"""<annotation><filename>{name}.jpg</filename>
<size><width>{w}</width><height>{h}</height><depth>3</depth></size>
<object><name>{cls}</name><difficult>0</difficult>
<bndbox><xmin>{x1 + 1}</xmin><ymin>{y1 + 1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
</object></annotation>"""
            )
        ids.append(name)
        base = np.array([[x1, y1, x2, y2]], np.float32)
        jit = base + rng.uniform(-4, 4, (6, 4)).astype(np.float32)
        rand = rng.uniform(0, 50, (5, 2))
        rand = np.concatenate([rand, rand + rng.uniform(10, 30, (5, 2))], 1).astype(
            np.float32
        )
        pboxes.append(np.concatenate([base, jit, rand]))
        pscores.append(rng.uniform(0.5, 1.0, 12).astype(np.float32))
    for split in ("trainval", "test"):
        with open(os.path.join(voc, "ImageSets", "Main", f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    with open(os.path.join(root, "props.pkl"), "wb") as f:
        pickle.dump({"indexes": ids, "boxes": pboxes, "scores": pscores}, f)
    emb = np.random.RandomState(1).randn(20, 8).astype(np.float32)
    with open(os.path.join(root, "emb.pkl"), "wb") as f:
        pickle.dump(emb, f)

    cfg_path = os.path.join(root, "tiny.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            f"""MODEL:
  LOAD_PROPOSALS: True
  ROI_HEADS:
    NUM_CLASSES: 20
  RESNETS:
    DEPTH: 18
    RES2_OUT_CHANNELS: 64
  BACKBONE:
    FREEZE_AT: 0
  RPN:
    PRE_NMS_TOPK_TRAIN: 32
    PRE_NMS_TOPK_TEST: 32
    POST_NMS_TOPK_TRAIN: 8
    POST_NMS_TOPK_TEST: 8
    BATCH_SIZE_PER_IMAGE: 16
  ROI_BOX_HEAD:
    DAN_DIM: [32, 32]
    OPEN_VOCABULARY:
      WEIGHT_DIM: 8
      DATA_AWARE: True
      WEIGHT_PATH_TRAIN: "{root}/emb.pkl"
      WEIGHT_PATH_TEST: "{root}/emb.pkl"
WSOVOD:
  INSTANCE_REFINEMENT:
    REFINE_NUM: 1
    REFINE_REG: [True]
DATASETS:
  TRAIN: ('voc_2007_trainval',)
  TEST: ('voc_2007_test',)
  PROPOSAL_FILES_TRAIN: ('{root}/props.pkl',)
  PROPOSAL_FILES_TEST: ('{root}/props.pkl',)
  PRECOMPUTED_PROPOSAL_TOPK_TRAIN: 12
  PRECOMPUTED_PROPOSAL_TOPK_TEST: 12
INPUT:
  MIN_SIZE_TRAIN: (64,)
  MAX_SIZE_TRAIN: 96
  MIN_SIZE_TEST: 64
  MAX_SIZE_TEST: 96
  CROP:
    ENABLED: False
SOLVER:
  IMS_PER_BATCH: 2
  BASE_LR: 0.001
  MAX_ITER: 3
  CHECKPOINT_PERIOD: 3
TEST:
  EVAL_PERIOD: 0
TPU:
  COMPUTE_DTYPE: "float32"
  PROPOSAL_PAD: 16
OUTPUT_DIR: "{root}/out"
"""
        )
    print(cfg_path)
    return root, cfg_path


if __name__ == "__main__":
    build(*(sys.argv[1:2] or ()))
