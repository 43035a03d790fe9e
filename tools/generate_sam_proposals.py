#!/usr/bin/env python
"""Offline SAM proposal generation on TPU.

Replaces ``tools/generate_sam_proposals_cuda.py:16-138`` (torchrun + NCCL):
shards the dataset across JAX processes, runs the JAX SamAutomaticMaskGenerator
per image (ViT-H, 32 points/side, pred-iou 0.86, stability 0.92, 1 crop layer
per the reference recipe), score = predicted_iou * stability clipped to 1,
and writes the d2-format pickle ``{boxes, scores, indexes}`` consumed by
``wsovod_tpu.data.proposals``.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="coco_2017_val")
    p.add_argument("--checkpoint", required=True, help="sam_vit_*.pth")
    p.add_argument("--model-type", default="vit_h", choices=["vit_b", "vit_l", "vit_h"])
    p.add_argument("--output", required=True)
    p.add_argument("--points-per-side", type=int, default=32)
    p.add_argument("--pred-iou-thresh", type=float, default=0.86)
    p.add_argument("--stability-thresh", type=float, default=0.92)
    p.add_argument("--crop-n-layers", type=int, default=1)
    p.add_argument("--min-box-area", type=float, default=20.0)
    p.add_argument("--limit", type=int, default=0, help="process only N images")
    args = p.parse_args()

    import jax

    from wsovod_tpu.data.catalog import DatasetCatalog
    from wsovod_tpu.data.dataset_mapper import read_image_bgr
    from wsovod_tpu.data.datasets.builtin import register_all
    from wsovod_tpu.offline.sam import (
        SAM,
        SamAutomaticMaskGenerator,
        import_sam_weights,
        load_sam_checkpoint,
    )

    register_all()
    dicts = DatasetCatalog.get(args.dataset)
    if args.limit:
        dicts = dicts[: args.limit]

    # shard across processes (multi-host slices)
    rank = jax.process_index()
    world = jax.process_count()
    shard = dicts[rank::world]

    sam = SAM(model_type=args.model_type)
    params = import_sam_weights(load_sam_checkpoint(args.checkpoint))
    amg = SamAutomaticMaskGenerator(
        sam,
        params,
        points_per_side=args.points_per_side,
        pred_iou_thresh=args.pred_iou_thresh,
        stability_score_thresh=args.stability_thresh,
        crop_n_layers=args.crop_n_layers,
        min_box_area=args.min_box_area,
    )

    ids, boxes, scores = [], [], []
    for i, rec in enumerate(shard):
        img = read_image_bgr(rec["file_name"])
        out = amg.generate(img)
        ids.append(rec["image_id"])
        boxes.append(out["boxes"].astype(np.float32))
        scores.append(out["scores"].astype(np.float32))
        if i % 50 == 0:
            print(f"[rank {rank}] {i}/{len(shard)}: {len(out['boxes'])} proposals")

    # gather across processes (host-side: each rank writes a shard; rank 0
    # merges if all shards present — single-host runs just write directly)
    if world > 1:
        shard_path = f"{args.output}.rank{rank}"
        with open(shard_path, "wb") as f:
            pickle.dump({"indexes": ids, "boxes": boxes, "scores": scores}, f)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("sam_proposals_done")
        if rank != 0:
            return
        for r in range(1, world):
            with open(f"{args.output}.rank{r}", "rb") as f:
                d = pickle.load(f)
            ids.extend(d["indexes"])
            boxes.extend(d["boxes"])
            scores.extend(d["scores"])

    with open(args.output, "wb") as f:
        pickle.dump({"indexes": ids, "boxes": boxes, "scores": scores}, f)
    print(f"wrote {len(ids)} images to {args.output}")


if __name__ == "__main__":
    main()
