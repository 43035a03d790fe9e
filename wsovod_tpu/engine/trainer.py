"""WSOVOD trainer: composes model/optimizer/loader/checkpointing/metrics.

Reference ``wsovod/engine/trainer.py:24-207`` (DefaultTrainer_WSOVOD) +
vendored d2 DefaultTrainer (``engine/defaults.py:47-457``). Differences by
design: the step is one jitted pure function over a data mesh (no DDP), and
gradient accumulation is ``optax.MultiSteps`` (ITER_SIZE) instead of a host
loop. Hooks become inline periodic actions: metric writers (period 20),
periodic + best checkpointers, in-training eval, parameter-norm inspection
(reference ``engine/hooks.py:48-70``).
"""

from __future__ import annotations

import logging
import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import build_detection_train_loader
from ..models import build_model
from ..parallel.distributed import to_global_batch
from ..parallel.mesh import create_mesh, replicate, shard_batch
from ..solver.build import auto_scale_workers, build_optimizer
from ..utils.checkpoint import Checkpointer
from ..utils.events import CommonMetricPrinter, EventStorage, JSONWriter, TensorboardWriter
from .train_loop import create_train_state, make_train_step

logger = logging.getLogger(__name__)


def load_class_embeddings(path: str) -> Optional[np.ndarray]:
    """Load a pickled C x D CLIP text-embedding matrix (reference
    ``open_vocabulary_classifier.py:51-57`` uses np.load with pickle)."""
    if not path or path == "rand":
        return None
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if hasattr(data, "numpy"):
        data = data.numpy()
    return np.asarray(data, dtype=np.float32)


class WSOVODTrainer:
    def __init__(self, cfg, resume: bool = False):
        cfg = auto_scale_workers(cfg, jax.device_count())
        self.cfg = cfg
        self.model = build_model(cfg)
        self.mesh = create_mesh(tuple(cfg.TPU.MESH_SHAPE), tuple(cfg.TPU.MESH_AXES))
        self.loader = self._build_loader(cfg)

        emb = self._load_train_embeddings(cfg)
        self.embeddings = jnp.asarray(emb) if emb is not None else None

        self._setup_sam_refine(cfg)

        batch = next(self.loader)
        device_batch = self._device_batch(batch)
        variables = self.model.init(
            {"params": jax.random.PRNGKey(cfg.SEED if cfg.SEED > 0 else 0),
             "dropout": jax.random.PRNGKey(1)},
            device_batch,
            train=True,
            iteration=jnp.asarray(0, jnp.int32),
            rng=jax.random.PRNGKey(2),
            embeddings=self.embeddings,
        )
        self.tx = build_optimizer(cfg, variables["params"])
        state = create_train_state(variables, self.tx, jax.random.PRNGKey(3))

        self.checkpointer = Checkpointer(cfg.OUTPUT_DIR)
        depth = cfg.MODEL.RESNETS.DEPTH
        pooled_c = 512 if depth < 50 else 2048
        if "vgg" in cfg.MODEL.BACKBONE.NAME:
            pooled_c = 512
        state = self._graft_sam_refiner(state)
        # train-mode --resume (reference tools/train_net.py:71
        # trainer.resume_or_load(resume=args.resume)): picks up the last
        # checkpoint in OUTPUT_DIR — step counter and optimizer state
        # continue, they do not restart
        self.state, self.resumed = self.checkpointer.resume_or_load(
            state,
            cfg.MODEL.WEIGHTS,
            resume=resume,
            model_cfg={
                "depth": depth,
                "pooled_shape": (
                    pooled_c,
                    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
                    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
                ),
            },
        )
        self._with_vis = cfg.VIS_PERIOD > 0
        self.step_fn = make_train_step(
            self.model, self.tx, mesh=self.mesh, with_vis=self._with_vis
        )
        self.storage = EventStorage(int(self.state.step))
        self.writers = [CommonMetricPrinter(cfg.SOLVER.MAX_ITER)]
        out = cfg.OUTPUT_DIR
        os.makedirs(out, exist_ok=True)
        self.writers.append(JSONWriter(os.path.join(out, "metrics.json")))
        try:
            self.writers.append(TensorboardWriter(out))
        except Exception:
            pass
        self._first_batch = batch

    def _build_loader(self, cfg):
        return build_detection_train_loader(cfg)

    def _load_train_embeddings(self, cfg):
        return load_class_embeddings(
            cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_PATH_TRAIN
        )

    def _run_step(self, state, device_batch, emb, host_batch):
        out = self.step_fn(state, device_batch, emb)
        return out if self._with_vis else (*out, {})

    def _setup_sam_refine(self, cfg):
        """WSOVOD.BBOX_REFINE: build + import the SAM image encoder; the
        decoder runs inside the train step (models/sam_refine.py). Disabled
        with a warning when the checkpoint is absent."""
        self.sam_encode = None
        if not cfg.WSOVOD.BBOX_REFINE.ENABLE:
            return
        ckpt = cfg.WSOVOD.BBOX_REFINE.MODEL_CHECKPOINT
        if not os.path.exists(ckpt):
            logger.warning(
                "BBOX_REFINE enabled but SAM checkpoint %s not found; "
                "pseudo-GT refinement disabled", ckpt,
            )
            return
        from ..models.sam_refine import sam_input_from_batch
        from ..offline.sam.modeling import SAMImageEncoder, SAM_CONFIGS
        from ..offline.sam.weights import import_sam_weights, load_sam_checkpoint

        blobs = load_sam_checkpoint(ckpt)
        sam_params = import_sam_weights(blobs)
        mt = cfg.WSOVOD.BBOX_REFINE.MODEL_TYPE
        c = SAM_CONFIGS[mt]
        encoder = SAMImageEncoder(
            embed_dim=c["embed_dim"], depth=c["depth"], num_heads=c["num_heads"],
            global_attn_indexes=c["global_attn_indexes"],
        )
        enc_params = {"params": sam_params["params"]["image_encoder"]}
        self._sam_refiner_params = {
            "prompt_encoder": sam_params["params"]["prompt_encoder"],
            "mask_decoder": sam_params["params"]["mask_decoder"],
        }

        sam_dt = jnp.dtype(cfg.TPU.SAM_COMPUTE_DTYPE)

        # params enter as an ARGUMENT: closure-captured arrays are inlined as
        # HLO constants, which blows up the compile payload (91M-param ViT)
        @jax.jit
        def encode(p, images):
            x, scale = sam_input_from_batch(images)
            out = encoder.apply(p, x.astype(sam_dt))
            return out.astype(jnp.float32), scale

        enc_params_dev = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, sam_dt)
            if np.asarray(a).dtype == np.float32
            else jnp.asarray(a),
            enc_params,
        )
        self.sam_encode = lambda images: encode(enc_params_dev, images)

    def _graft_sam_refiner(self, state):
        """Replace the randomly initialized refiner params with the imported
        SAM prompt-encoder/mask-decoder weights."""
        if self.sam_encode is None:
            return state
        params = state.params["params"] if "params" in state.params else state.params
        rh = params.get("roi_heads", {})
        if "sam_refiner" in rh:
            rh = dict(rh)
            rh["sam_refiner"] = jax.tree_util.tree_map(
                jnp.asarray, self._sam_refiner_params
            )
            params = dict(params)
            params["roi_heads"] = rh
            new = dict(state.params)
            new["params"] = params
            state = state.replace(params=new)
            logger.info("grafted SAM refiner weights from checkpoint")
        return state

    def _device_batch(self, batch):
        keys = (
            "images", "image_sizes", "sam_boxes", "sam_scores", "sam_valid",
            "gt_classes", "gt_valid",
        )
        out = {k: jnp.asarray(batch[k]) for k in keys if k in batch}
        if self.sam_encode is not None:
            out["sam_embed"], out["sam_scale"] = self.sam_encode(out["images"])
        return out

    def train(self):
        cfg = self.cfg
        state = replicate(self.state, self.mesh)
        emb = (
            replicate(self.embeddings, self.mesh)
            if self.embeddings is not None
            else None
        )
        start = int(jax.device_get(state.step))
        max_iter = cfg.SOLVER.MAX_ITER
        logger.info("training from iter %d to %d", start, max_iter)

        from .hooks import ParametersNormInspectHook

        norm_hook = ParametersNormInspectHook(period=max(20, cfg.SOLVER.CHECKPOINT_PERIOD // 10))
        profile_dir = os.environ.get("WSOVOD_PROFILE_DIR", "")
        if profile_dir:
            # jax.profiler trace of the first steps (SURVEY §5 tracing)
            jax.profiler.start_trace(profile_dir)

        batch = self._first_batch
        data_t0 = time.perf_counter()
        for it in range(start, max_iter):
            device_batch = to_global_batch(self._device_batch(batch), self.mesh)
            data_time = time.perf_counter() - data_t0
            with self.mesh:
                state, metrics, vis = self._run_step(
                    state, device_batch, emb, batch
                )
            if self._with_vis and (it + 1) % cfg.VIS_PERIOD == 0:
                self._dump_vis(it, device_batch, vis)
            # fetch next batch while the step runs (async dispatch)
            batch = next(self.loader)
            data_t0 = time.perf_counter()

            self.storage.iter = it
            if (it + 1) % 20 == 0 or it == start:
                host_metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
                self.storage.put_scalars(data_time=data_time, **host_metrics)
                for w in self.writers:
                    w.write(self.storage)
            if profile_dir and it == start + 10:
                jax.profiler.stop_trace()
                profile_dir = ""
            try:
                norm_hook.after_step(
                    it,
                    state.params["params"] if "params" in state.params else state.params,
                    self.storage,
                )
            except Exception:
                pass
            if (it + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
                self.state = jax.device_get(state)
                self.checkpointer.save(f"model_{it:07d}", self.state)
            if cfg.TEST.EVAL_PERIOD > 0 and (it + 1) % cfg.TEST.EVAL_PERIOD == 0:
                self._eval_during_train(state)

        self.state = jax.device_get(state)
        self.checkpointer.save("model_final", self.state)
        # reference registers EvalHook(0, test_with_TTA_WSL) when
        # TEST.AUG.ENABLED (tools/train_net.py:72-77); d2's period-0 EvalHook
        # fires once after the FINAL iteration — same moment as here
        if cfg.TEST.AUG.ENABLED:
            try:
                from .evaluator import test_with_TTA_WSL

                test_emb = load_class_embeddings(
                    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_PATH_TEST
                )
                self.final_tta_results = test_with_TTA_WSL(
                    cfg, self.model, self.state.params,
                    embeddings=self.embeddings,
                    classifier=(
                        jnp.asarray(test_emb) if test_emb is not None else None
                    ),
                )
            except Exception:
                logger.exception("final TTA eval failed")
        for w in self.writers:
            w.close()
        return self.state

    def _dump_vis(self, it, device_batch, vis):
        """VIS_PERIOD pseudo-GT dump (reference roi_heads.py:1345-1425):
        draw the step's mined pseudo GT over the (network-input) images and
        write PNGs under OUTPUT_DIR/vis_pgt. Host-side; failures never kill
        training."""
        try:
            pgt = None
            for leaf in jax.tree_util.tree_leaves(
                vis, is_leaf=lambda x: isinstance(x, dict) and "boxes" in x
            ):
                if isinstance(leaf, dict) and "boxes" in leaf:
                    pgt = leaf
                    break
            if pgt is None:
                return
            pgt = jax.device_get(pgt)
            images = np.asarray(jax.device_get(device_batch["images"]))
            from ..utils.visualization import vis_pgt

            for b in range(min(images.shape[0], 2)):
                v = np.asarray(pgt["valid"][b]).astype(bool)
                if not v.any():
                    continue
                vis_pgt(
                    self.cfg.OUTPUT_DIR, "vis_pgt", f"_b{b}", it,
                    images[b],
                    np.asarray(pgt["boxes"][b])[v],
                    scores=np.asarray(pgt["scores"][b])[v],
                    classes=np.asarray(pgt["classes"][b])[v],
                )
        except Exception:
            logger.exception("VIS_PERIOD dump failed at iter %d", it)

    def _eval_during_train(self, state):
        from .evaluator import test_WSL

        test_emb = load_class_embeddings(
            self.cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_PATH_TEST
        )
        classifier = jnp.asarray(test_emb) if test_emb is not None else None
        results = test_WSL(
            self.cfg, self.model, state.params, embeddings=self.embeddings,
            classifier=classifier,
        )
        for name, res in results.items():
            for metric, val in res.get("bbox", {}).items():
                if isinstance(val, float):
                    self.storage.put_scalar(f"{name}/{metric}", val)
        ap50 = next(
            (r["bbox"].get("AP50") for r in results.values() if "bbox" in r), None
        )
        if ap50 is not None:
            best_path = os.path.join(self.cfg.OUTPUT_DIR, "best_ap50.txt")
            prev = -1.0
            if os.path.exists(best_path):
                with open(best_path) as f:
                    prev = float(f.read().strip() or -1)
            if ap50 > prev:
                with open(best_path, "w") as f:
                    f.write(str(ap50))
                self.checkpointer.save("model_best", jax.device_get(state))


class WSOVODTrainer_MixedDatasets(WSOVODTrainer):
    """Multi-dataset variant (reference ``trainer.py:210-412``): homogeneous
    per-dataset batches select a per-dataset compiled step (static
    ``source_id``) and the dataset's own CLIP classifier."""

    def _load_train_embeddings(self, cfg):
        self.embeddings_list = [
            jnp.asarray(load_class_embeddings(p))
            for p in cfg.DATASETS.MIXED_DATASETS.WEIGHT_PATH_TRAINS
        ]
        return self.embeddings_list[0]

    def _build_loader(self, cfg):
        from ..data.loader_multi_dataset import build_multi_dataset_train_loader

        return build_multi_dataset_train_loader(cfg)

    def __init__(self, cfg, resume: bool = False):
        super().__init__(cfg, resume=resume)
        from .train_loop import make_train_step as _mts

        self._step_fns = {
            sid: _mts(
                self.model, self.tx, mesh=self.mesh, source_id=sid,
                with_vis=self._with_vis,
            )
            for sid in range(len(self.embeddings_list))
        }

    def _run_step(self, state, device_batch, emb, host_batch):
        # homogeneous batch: every record shares dataset_id (reference
        # ``engine/trainer.py:253-255`` asserts this)
        sid = int(np.asarray(host_batch["dataset_id"]).reshape(-1)[0])
        out = self._step_fns[sid](state, device_batch, self.embeddings_list[sid])
        return out if self._with_vis else (*out, {})
