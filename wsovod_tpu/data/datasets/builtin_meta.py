"""Built-in dataset metadata: COCO 80 categories (with VOC-overlap flags used
by the open-vocabulary COCO split), VOC 20 classes. Standard public tables
(reference ``wsovod/data/datasets/builtin_meta.py:21-232``)."""

# (coco category id, name, in_voc)
COCO_CATEGORIES = [
    (1, "person", True),
    (2, "bicycle", True),
    (3, "car", True),
    (4, "motorcycle", True),
    (5, "airplane", True),
    (6, "bus", True),
    (7, "train", True),
    (8, "truck", False),
    (9, "boat", True),
    (10, "traffic light", False),
    (11, "fire hydrant", False),
    (13, "stop sign", False),
    (14, "parking meter", False),
    (15, "bench", False),
    (16, "bird", True),
    (17, "cat", True),
    (18, "dog", True),
    (19, "horse", True),
    (20, "sheep", True),
    (21, "cow", True),
    (22, "elephant", False),
    (23, "bear", False),
    (24, "zebra", False),
    (25, "giraffe", False),
    (27, "backpack", False),
    (28, "umbrella", False),
    (31, "handbag", False),
    (32, "tie", False),
    (33, "suitcase", False),
    (34, "frisbee", False),
    (35, "skis", False),
    (36, "snowboard", False),
    (37, "sports ball", False),
    (38, "kite", False),
    (39, "baseball bat", False),
    (40, "baseball glove", False),
    (41, "skateboard", False),
    (42, "surfboard", False),
    (43, "tennis racket", False),
    (44, "bottle", True),
    (46, "wine glass", False),
    (47, "cup", False),
    (48, "fork", False),
    (49, "knife", False),
    (50, "spoon", False),
    (51, "bowl", False),
    (52, "banana", False),
    (53, "apple", False),
    (54, "sandwich", False),
    (55, "orange", False),
    (56, "broccoli", False),
    (57, "carrot", False),
    (58, "hot dog", False),
    (59, "pizza", False),
    (60, "donut", False),
    (61, "cake", False),
    (62, "chair", True),
    (63, "couch", True),
    (64, "potted plant", True),
    (65, "bed", False),
    (67, "dining table", True),
    (70, "toilet", False),
    (72, "tv", True),
    (73, "laptop", False),
    (74, "mouse", False),
    (75, "remote", False),
    (76, "keyboard", False),
    (77, "cell phone", False),
    (78, "microwave", False),
    (79, "oven", False),
    (80, "toaster", False),
    (81, "sink", False),
    (82, "refrigerator", False),
    (84, "book", False),
    (85, "clock", False),
    (86, "vase", False),
    (87, "scissors", False),
    (88, "teddy bear", False),
    (89, "hair drier", False),
    (90, "toothbrush", False),
]

VOC_CLASS_NAMES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)

# Open-vocabulary COCO split: 48 base / 17 novel (Bansal et al. / OVR-CNN
# convention, reference ``ov_coco_evaluation.py:410-498``).
COCO_OVD_BASE_NAMES = [
    "person", "bicycle", "car", "motorcycle", "train", "truck", "boat",
    "bench", "bird", "horse", "sheep", "bear", "zebra", "giraffe",
    "backpack", "handbag", "suitcase", "frisbee", "skis", "kite",
    "surfboard", "bottle", "fork", "spoon", "bowl", "banana", "apple",
    "sandwich", "orange", "broccoli", "carrot", "pizza", "donut", "chair",
    "bed", "toilet", "tv", "laptop", "mouse", "remote", "microwave",
    "oven", "toaster", "refrigerator", "book", "clock", "vase",
    "toothbrush",
]
COCO_OVD_NOVEL_NAMES = [
    "airplane", "bus", "cat", "dog", "cow", "elephant", "umbrella", "tie",
    "snowboard", "skateboard", "cup", "knife", "cake", "couch", "keyboard",
    "sink", "scissors",
]


def coco_meta():
    ids = [c[0] for c in COCO_CATEGORIES]
    names = [c[1] for c in COCO_CATEGORIES]
    return {
        "thing_classes": names,
        "thing_dataset_id_to_contiguous_id": {cid: i for i, cid in enumerate(ids)},
        "in_voc": [c[2] for c in COCO_CATEGORIES],
        "base_classes": COCO_OVD_BASE_NAMES,
        "novel_classes": COCO_OVD_NOVEL_NAMES,
    }


def voc_meta():
    return {"thing_classes": list(VOC_CLASS_NAMES)}


def get_builtin_metadata(kind: str):
    if kind == "coco":
        return coco_meta()
    if kind in ("voc", "pascal_voc"):
        return voc_meta()
    raise KeyError(kind)
