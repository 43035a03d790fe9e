"""Train-step benchmark on one TPU chip (VERDICT r1 weak #2 / next #5).

Measures ms/step for the SHIPPED recipe truth: R18-DC5, batch 4, ~800px,
4000 SAM + 1024 RPN proposals, REFINE_NUM 1 + regression, with and without
WSOVOD.BBOX_REFINE (SAM vit_b encoder per batch as its own jit + prompt
encoder/mask decoder inside the step — weights random here; FLOP cost is
weight-independent). Also the round-1 comparison config (3 refineries).

Usage: python scripts/bench_train.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_cfg(
    refine_k=1, bbox_refine=False, depth=18, mrrp=False, pooler="ROIPool",
    mixed=False,
):
    from wsovod_tpu.config import get_cfg

    cfg = get_cfg()
    if mixed:
        # 2-dataset mixed recipe (VOC20 + COCO80) — per-dataset compiled
        # step, source 0 benched
        cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN_WSOVOD_MixedDatasets"
        cfg.DATASETS.MIXED_DATASETS.NAMES = ["voc_2007_trainval", "coco_2017_train"]
        cfg.DATASETS.MIXED_DATASETS.NUM_CLASSES = [20, 80]
    cfg.MODEL.RESNETS.DEPTH = depth
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64 if depth == 18 else 256
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 80
    # every shipped config freezes the backbone (FREEZE_AT: 5) - the frozen
    # path also drops the whole backbone backward at compile time
    cfg.MODEL.BACKBONE.FREEZE_AT = 5
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 2048
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 1024
    if mrrp:
        # MRRP flagship (WSOVOD_MRRP_WSR_50_DC5_1x): 3 shared-weight branches
        # with ROILoopPool
        cfg.MODEL.MRRP.MRRP_ON = True
        cfg.MODEL.MRRP.NUM_BRANCH = 3
        cfg.MODEL.MRRP.BRANCH_DILATIONS = [1, 2, 3]
        cfg.TPU.UNFUSED_ROI_CHUNK = 256  # 3 branches x triple pooled chunks
        pooler = "ROILoopPool"
    cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE = pooler
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.DATA_AWARE = True
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_NUM = refine_k
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_REG = [True] * refine_k
    cfg.WSOVOD.BBOX_REFINE.ENABLE = bbox_refine
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    return cfg


def make_batch(B, H, W, S, G=8, seed=0):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    xy = rng.uniform(0, W * 0.6, (B, S, 2))
    # honest SAM-AMG-like long-tail mix, same as bench.py (the pre-r5 bench
    # was all-U(8,300) — every box narrow at the loop kernel's win=96, so
    # the wide-tail program was never exercised in the train numbers).
    # BENCH_ROI_DIST=narrow restores the old distribution for A/B.
    if os.environ.get("BENCH_ROI_DIST", "mixed") == "narrow" or S < 64:
        wh = rng.uniform(8, 300, (B, S, 2))
    else:
        u = rng.rand(B, S, 1)
        wh = np.where(
            u < 0.80,
            rng.uniform(8, 300, (B, S, 2)),
            np.where(
                u < 0.95,
                rng.uniform(300, 700, (B, S, 2)),
                np.stack(
                    [rng.uniform(0.7, 1.0, (B, S)) * W,
                     rng.uniform(0.7, 1.0, (B, S)) * H], -1
                ),
            ),
        )
    boxes = np.concatenate([xy, xy + wh], -1)
    boxes[..., [0, 2]] = boxes[..., [0, 2]].clip(0, W)
    boxes[..., [1, 3]] = boxes[..., [1, 3]].clip(0, H)
    return {
        "images": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray(np.array([[H, W]] * B, np.int32)),
        "sam_boxes": jnp.asarray(boxes.astype(np.float32)),
        "sam_scores": jnp.asarray(rng.uniform(0.3, 1, (B, S)).astype(np.float32)),
        "sam_valid": jnp.ones((B, S), bool),
        "gt_classes": jnp.asarray(rng.randint(0, 80, (B, G))),
        "gt_valid": jnp.ones((B, G), bool),
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax
    import jax.numpy as jnp

    from wsovod_tpu.engine.train_loop import create_train_state, make_train_step
    from wsovod_tpu.models import build_model
    from wsovod_tpu.solver.build import build_optimizer

    B, H, W, S = 4, 800, 1216, 4000
    emb = jnp.asarray(np.random.RandomState(1).randn(80, 512).astype(np.float32))

    def bench(name, refine_k, bbox_refine, **kw):
        cfg = build_cfg(refine_k, bbox_refine, **kw)
        model = build_model(cfg)
        batch = make_batch(B, H, W, S)
        mixed = kw.get("mixed", False)
        step_kw = dict(source_id=0) if mixed else {}
        n_cls = cfg.DATASETS.MIXED_DATASETS.NUM_CLASSES[0] if mixed else 80
        emb_b = emb[:n_cls]
        if mixed:
            batch["gt_classes"] = batch["gt_classes"] % n_cls

        sam_encode = None
        if bbox_refine:
            from wsovod_tpu.models.sam_refine import sam_input_from_batch
            from wsovod_tpu.offline.sam.modeling import SAM_CONFIGS, SAMImageEncoder

            c = SAM_CONFIGS["vit_b"]
            encoder = SAMImageEncoder(
                embed_dim=c["embed_dim"], depth=c["depth"],
                num_heads=c["num_heads"],
                global_attn_indexes=c["global_attn_indexes"],
            )
            x0, _ = sam_input_from_batch(batch["images"][:1])
            enc_params = jax.jit(
                lambda: encoder.init(jax.random.PRNGKey(0), x0)
            )()

            import jax.numpy as jnp2

            sam_dt = jnp2.bfloat16 if os.environ.get("SAM_DT", "bf16") == "bf16" else jnp2.float32

            @jax.jit
            def encode(p, images):
                x, scale = sam_input_from_batch(images)
                return encoder.apply(p, x.astype(sam_dt)).astype(jnp2.float32), scale

            enc_params = jax.tree_util.tree_map(
                lambda a: a.astype(sam_dt) if a.dtype == jnp2.float32 else a, enc_params
            )
            encode_fn = lambda images: encode(enc_params, images)
            batch["sam_embed"], batch["sam_scale"] = encode_fn(batch["images"])

        # init on tiny shapes
        init_batch = make_batch(1, 128, 128, 16, 4)
        if mixed:
            init_batch["gt_classes"] = init_batch["gt_classes"] % n_cls
        if bbox_refine:
            init_batch["sam_embed"] = batch["sam_embed"][:1]
            init_batch["sam_scale"] = batch["sam_scale"][:1]
        variables = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                init_batch, train=True, iteration=jnp.asarray(0, jnp.int32),
                rng=jax.random.PRNGKey(2), embeddings=emb_b, **step_kw,
            )
        )()
        tx = build_optimizer(cfg, variables["params"])
        state = create_train_state(variables, tx, jax.random.PRNGKey(3))
        step = make_train_step(model, tx, **step_kw)

        state, metrics = step(state, batch, emb_b)  # compile + 1st step
        np.asarray(metrics["total_loss"])
        t0 = time.perf_counter()
        for _ in range(reps):
            state, metrics = step(state, batch, emb_b)
        np.asarray(metrics["total_loss"])
        dt_step = (time.perf_counter() - t0) / reps * 1000

        dt_enc = 0.0
        if bbox_refine:
            e, s = encode_fn(batch["images"])
            np.asarray(s)
            t0 = time.perf_counter()
            for _ in range(reps):
                e, s = encode_fn(batch["images"])
            np.asarray(s)
            dt_enc = (time.perf_counter() - t0) / reps * 1000
        print(
            f"{name}: step {dt_step:.1f} ms + sam-encode {dt_enc:.1f} ms"
            f" = {dt_step + dt_enc:.1f} ms/step ({B} imgs)",
            flush=True,
        )

    only = os.environ.get("BENCH_ONLY", "")
    if only == "refine":
        bench("R18-DC5 K=1 + BBOX_REFINE vit_b      ", 1, True)
        return
    if only == "r50":
        # flagship WSR-50-DC5 (ROIPool, the shipped pooler)
        bench("R50-DC5 K=1 (flagship)               ", 1, False, depth=50)
        return
    if only == "r50_refine":
        bench("R50-DC5 K=1 + BBOX_REFINE vit_b      ", 1, True, depth=50)
        return
    if only == "mrrp50":
        # strongest paper variant: MRRP-WSR-50 + ROILoopPool
        bench("MRRP-R50-DC5 K=1 (ROILoopPool)       ", 1, False, depth=50, mrrp=True)
        return
    if only == "mixed":
        # mixed-datasets source-0 step (VOC of VOC+COCO), with the SAM
        # pseudo-GT refinement share the shipped mixed configs enable
        bench("Mixed-R18-DC5 K=1 (src 0, no refine) ", 1, False, mixed=True)
        bench("Mixed-R18-DC5 K=1 + BBOX_REFINE vit_b", 1, True, mixed=True)
        return
    bench("R18-DC5 K=1 (shipped, no BBOX_REFINE)", 1, False)
    bench("R18-DC5 K=1 + BBOX_REFINE vit_b      ", 1, True)
    bench("R18-DC5 K=3 (round-1 comparison)     ", 3, False)


if __name__ == "__main__":
    main()
