"""Precomputed (SAM) proposal loading.

Reference ``wsovod/data/build.py:112-173`` (``load_proposals_into_dataset``):
a pickle with ``ids``, ``boxes``, ``objectness_logits`` (D1-era keys
``indexes``/``scores`` are renamed), per-image proposals sorted by score and
truncated to topk at mapping time; plus the ``unique_boxes`` hash dedup from
``detection_utils.py:206-266``.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List

import numpy as np


def load_proposal_file(path: str) -> Dict:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    rename = {"indexes": "ids", "scores": "objectness_logits"}
    for old, new in rename.items():
        if old in data:
            data[new] = data.pop(old)
    return data


def load_proposals_into_dataset(dataset_dicts: List[dict], proposal_file: str) -> List[dict]:
    if os.path.isdir(proposal_file):
        # dir-of-pkl mode (reference build.py:144-173): one pickle per image,
        # keyed by image_id filename
        out = []
        for record in dataset_dicts:
            per = os.path.join(proposal_file, f"{record['image_id']}.pkl")
            if not os.path.exists(per):
                continue
            with open(per, "rb") as f:
                d = pickle.load(f, encoding="latin1")
            record = dict(record)
            boxes = np.asarray(d["boxes"], dtype=np.float32).reshape(-1, 4)
            logits = np.asarray(
                d.get("objectness_logits", d.get("scores")), dtype=np.float32
            ).reshape(-1)
            order = np.argsort(-logits)
            record["proposal_boxes"] = boxes[order]
            record["proposal_objectness_logits"] = logits[order]
            out.append(record)
        return out
    data = load_proposal_file(proposal_file)
    id_to_idx = {str(i): k for k, i in enumerate(data["ids"])}
    out = []
    for record in dataset_dicts:
        key = str(record["image_id"])
        if key not in id_to_idx:
            continue
        i = id_to_idx[key]
        record = dict(record)
        boxes = np.asarray(data["boxes"][i], dtype=np.float32).reshape(-1, 4)
        logits = np.asarray(data["objectness_logits"][i], dtype=np.float32).reshape(-1)
        order = np.argsort(-logits)
        record["proposal_boxes"] = boxes[order]
        record["proposal_objectness_logits"] = logits[order]
        out.append(record)
    return out


def unique_boxes(boxes: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """Indices of unique boxes via the hashed-coordinates trick
    (reference ``detection_utils.py:206-266``)."""
    v = np.array([1, 1e3, 1e6, 1e9])
    hashes = np.round(boxes * scale).dot(v)
    _, index = np.unique(hashes, return_index=True)
    return np.sort(index)
