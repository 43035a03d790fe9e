#!/usr/bin/env python
"""Train/eval CLI (mirrors reference ``tools/train_net.py:31-90``).

Examples:
  python tools/train_net.py --config-file configs/COCO-Detection/WSOVOD_WSR_18_DC5_1x.yaml
  python tools/train_net.py --config-file ... --eval-only MODEL.WEIGHTS path.pkl

Trainer class is selected by "MixedDatasets" in the config path, as in the
reference (``tools/train_net.py:47-50``). Multi-chip data parallelism comes
from the device mesh — no launcher processes needed on a TPU slice host.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# WSOVOD_PLATFORM=cpu forces the CPU backend (useful for smoke runs on hosts
# where a sitecustomize pins JAX_PLATFORMS to an accelerator plugin — env-var
# prefixes alone do not override that pin).
_plat = os.environ.get("WSOVOD_PLATFORM")
if _plat:
    os.environ["JAX_PLATFORMS"] = _plat
    import jax

    jax.config.update("jax_platforms", _plat)


def default_argument_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-gpus", type=int, default=0, help="ignored (TPU mesh auto)")
    p.add_argument("--num-machines", type=int, default=1)
    p.add_argument("--machine-rank", type=int, default=0)
    p.add_argument("--dist-url", default="auto")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p


def setup(args):
    from wsovod_tpu.config import get_cfg

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )
    return cfg


def main(args):
    # multi-host SPMD: connect this process to the slice-wide cluster before
    # any device use (reference d2 launch/DDP, tools/train_net.py:83-90)
    from wsovod_tpu.parallel.distributed import initialize_from_args

    initialize_from_args(args.num_machines, args.machine_rank, args.dist_url)

    cfg = setup(args)

    from wsovod_tpu.data.datasets.builtin import register_all

    register_all()

    mixed = "MixedDatasets" in (args.config_file or "")

    if args.eval_only:
        import jax
        import jax.numpy as jnp

        from wsovod_tpu.engine.evaluator import test_WSL
        from wsovod_tpu.engine.trainer import load_class_embeddings
        from wsovod_tpu.engine.train_loop import create_train_state
        from wsovod_tpu.models import build_model
        from wsovod_tpu.solver.build import build_optimizer
        from wsovod_tpu.utils.checkpoint import Checkpointer

        model = build_model(cfg)
        emb = load_class_embeddings(
            cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_PATH_TRAIN
        )
        test_emb = load_class_embeddings(
            cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_PATH_TEST
        )
        # init with a synthetic batch matching the eval pipeline shapes
        import numpy as np

        # init in TRAIN mode on tiny shapes so the full param set exists
        # (the inference path never calls the object miner, and a template
        # missing its params cannot restore a training checkpoint)
        size = 64
        p = 16
        batch = {
            "images": jnp.zeros((1, size, size, 3), jnp.float32),
            "image_sizes": jnp.asarray([[size, size]], jnp.int32),
            "sam_boxes": jnp.tile(
                jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]], jnp.float32), (1, p, 1)
            ),
            "sam_scores": jnp.full((1, p), 0.9, jnp.float32),
            "sam_valid": jnp.ones((1, p), bool),
            "gt_classes": jnp.zeros((1, 4), jnp.int32),
            "gt_valid": jnp.ones((1, 4), bool),
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch,
            train=True,
            iteration=jnp.asarray(0, jnp.int32),
            rng=jax.random.PRNGKey(2),
            embeddings=jnp.asarray(emb) if emb is not None else None,
        )
        tx = build_optimizer(cfg, variables["params"])
        state = create_train_state(variables, tx, jax.random.PRNGKey(0))
        ckpt = Checkpointer(cfg.OUTPUT_DIR)
        state, _ = ckpt.resume_or_load(
            state, cfg.MODEL.WEIGHTS, resume=args.resume,
            model_cfg={"depth": cfg.MODEL.RESNETS.DEPTH},
        )
        results = test_WSL(
            cfg, model, state.params,
            embeddings=jnp.asarray(emb) if emb is not None else None,
            classifier=jnp.asarray(test_emb) if test_emb is not None else None,
        )
        # reference tools/train_net.py:58-62: TTA pass when TEST.AUG.ENABLED,
        # then verify_results against TEST.EXPECTED_RESULTS
        if cfg.TEST.AUG.ENABLED:
            from wsovod_tpu.engine.evaluator import test_with_TTA_WSL

            results.update(
                test_with_TTA_WSL(
                    cfg, model, state.params,
                    embeddings=jnp.asarray(emb) if emb is not None else None,
                    classifier=(
                        jnp.asarray(test_emb) if test_emb is not None else None
                    ),
                )
            )
        from wsovod_tpu.engine.hooks import verify_results

        verify_results(cfg, results)
        print(results)
        return results

    from wsovod_tpu.engine.trainer import WSOVODTrainer, WSOVODTrainer_MixedDatasets

    trainer_cls = WSOVODTrainer_MixedDatasets if mixed else WSOVODTrainer
    trainer = trainer_cls(cfg, resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    main(args)
