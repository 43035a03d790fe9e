"""Per-stage inference timing on one TPU chip (serialized in-jit reps).

Stages: backbone / RPN+NMS+SAM-fusion / roi_heads.inference (fused pool +
DAN + refineries + final NMS), at the bench.py shape. Single-call wall
timings through the axon tunnel are unreliable; each stage is chained
``reps`` times inside one jit via a data dependency.

Usage: python scripts/bench_stages.py [reps] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import jax
    import jax.numpy as jnp

    from wsovod_tpu.config import get_cfg
    from wsovod_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 80
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 2048
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 1024
    cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE = os.environ.get(
        "BENCH_POOLER", "ROIPool"  # the shipped flagship pooler
    )
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.DATA_AWARE = True
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_NUM = 1
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_REG = [True]
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"

    H, W, S = 688, 1056, 4000
    rng = np.random.RandomState(0)
    boxes = rng.uniform(0, W * 0.6, (B, S, 2))
    boxes = np.concatenate([boxes, boxes + rng.uniform(8, 300, (B, S, 2))], -1)
    batch = {
        "images": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray(np.array([[H, W]] * B, np.int32)),
        "sam_boxes": jnp.asarray(boxes.astype(np.float32)),
        "sam_scores": jnp.asarray(rng.uniform(0.3, 1, (B, S)).astype(np.float32)),
        "sam_valid": jnp.ones((B, S), bool),
    }
    emb = jnp.asarray(rng.randn(80, 512).astype(np.float32))
    model = build_model(cfg)
    init_batch = {
        "images": jnp.zeros((1, 128, 128, 3), jnp.float32),
        "image_sizes": jnp.asarray([[128, 128]], jnp.int32),
        "sam_boxes": jnp.asarray(boxes[:1, :16] * (128.0 / W), jnp.float32),
        "sam_scores": batch["sam_scores"][:1, :16],
        "sam_valid": batch["sam_valid"][:1, :16],
    }
    params = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, init_batch,
                           train=False, embeddings=emb)
    )()

    def fetch_scalar(out):
        # slice ON DEVICE first — np.asarray of a big leaf drags the whole
        # tensor through the axon tunnel (~40 MB/s) and corrupts the timing
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])

    def timeit(name, fn, *args):
        out = fn(params, *args)
        fetch_scalar(out)
        t0 = time.perf_counter()
        out = fn(params, *args)
        fetch_scalar(out)
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:34s}: {dt:7.2f} ms/batch ({dt / B:6.2f} ms/img)", flush=True)
        return out

    # ---- backbone
    @jax.jit
    def run_backbone(params, images):
        def m_bb(m, x):
            return m.backbone(m._normalize(x), train=False)

        f = None
        x = images
        for _ in range(reps):
            f = model.apply(params, x, method=m_bb)
            x = images + f["res5"][0, 0, 0, 0].astype(images.dtype) * 0
        return f

    feats = timeit("backbone (R50-DC5 bf16)", run_backbone, batch["images"])
    feats = jax.tree_util.tree_map(lambda a: a, feats)

    # ---- RPN + NMS + SAM fusion
    @jax.jit
    def run_rpn(params, feats, batch):
        def m_prop(m, f, b):
            return m._proposals(f, b, False, None, None)[0]

        out = None
        f = feats
        for _ in range(reps):
            out = model.apply(params, f, batch, method=m_prop)
            f = {k: v + out.objectness_logits[0, 0].astype(v.dtype) * 0
                 for k, v in f.items()}
        return out

    proposals = timeit("RPN head+NMS+SAM fusion", run_rpn, feats, batch)

    # ---- roi_heads.inference (fused pool+fc1, DAN, refineries, final NMS)
    @jax.jit
    def run_heads(params, feats, proposals, batch):
        def m_heads(m, f, p, b):
            daf = None
            if m.data_aware_head is not None:
                feat = f[m.in_feature]
                daf = m.data_aware_head(feat, pixel_valid=None)
            return m.roi_heads.inference(
                f, p, b["image_sizes"], data_aware_features=daf,
                embeddings=emb,
            )[0]

        out = None
        f = feats
        for _ in range(reps):
            out = model.apply(params, f, proposals, batch, method=m_heads)
            f = {k: v + out.scores[0, 0].astype(v.dtype) * 0 for k, v in f.items()}
        return out

    timeit("roi_heads (pool+DAN+refine+NMS)", run_heads, feats, proposals, batch)

    # ---- full model for reference
    @jax.jit
    def run_full(params, batch):
        out = None
        imgs = batch["images"]
        for _ in range(reps):
            det, _, _ = model.apply(
                params, dict(batch, images=imgs), train=False, embeddings=emb
            )
            out = det
            imgs = batch["images"] + det.scores[0, 0].astype(imgs.dtype) * 0
        return out

    timeit("FULL inference", run_full, batch)


if __name__ == "__main__":
    main()
