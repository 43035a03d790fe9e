"""Optimizer and LR schedules (optax).

Reference ``wsovod/solver/build.py`` + vendored d2 trainer optimizer logic
(``wsovod/engine/defaults.py:273-323``): SGD with momentum and per-group
hyperparameters — bias LR x BIAS_LR_FACTOR and WEIGHT_DECAY_BIAS, backbone LR
x BACKBONE_MULTIPLIER, frozen stages LR 0 — plus WarmupMultiStep/Cosine
schedules and optional full-model gradient clipping, and d2's
``auto_scale_workers`` (``engine/defaults.py:422-444``).

In optax this is one ``multi_transform`` over parameter labels computed from
the param-tree paths. FrozenBatchNorm statistics are always labeled frozen.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax


def _stage_of_backbone_param(path: str) -> int:
    """Map a backbone param path to its freeze stage index (d2 convention:
    1 = stem, 2..5 = res2..res5 / plain1..plain5-ish)."""
    if "stem" in path:
        return 1
    for s in range(2, 6):
        if f"res{s}_" in path or f"plain{s}" in path:
            return s
    return 5


def param_labels(params: Dict[str, Any], freeze_at: int) -> Dict[str, Any]:
    """Label each param: frozen / backbone / bias / default."""

    def label(key_path, _):
        path = jax.tree_util.keystr(key_path)
        if "FrozenBatchNorm" in path or "sam_refiner" in path:
            return "frozen"
        if "backbone" in path and "rpn" not in path:
            if _stage_of_backbone_param(path) <= freeze_at:
                return "frozen"
            return "backbone"
        leaf = path.rsplit("[", 1)[-1]
        if "bias" in leaf:
            return "bias"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def make_lr_schedule(cfg):
    name = cfg.SOLVER.LR_SCHEDULER_NAME
    base = cfg.SOLVER.BASE_LR
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    max_iter = cfg.SOLVER.MAX_ITER

    if name == "WarmupMultiStepLR":
        steps = [s for s in cfg.SOLVER.STEPS if s <= max_iter]
        gamma = cfg.SOLVER.GAMMA

        def schedule(count):
            import jax.numpy as jnp

            count = jnp.asarray(count, jnp.float32)
            lr = base
            mult = jnp.ones(())
            for s in steps:
                mult = mult * jnp.where(count >= s, gamma, 1.0)
            warm = jnp.where(
                count < warmup_iters,
                warmup_factor * (1 - count / max(warmup_iters, 1)) + count / max(warmup_iters, 1),
                1.0,
            )
            return lr * mult * warm

        return schedule

    if name == "WarmupCosineLR":
        import jax.numpy as jnp

        end = cfg.SOLVER.BASE_LR_END

        def schedule(count):
            count = jnp.asarray(count, jnp.float32)
            frac = jnp.clip(count / max_iter, 0.0, 1.0)
            cos = 0.5 * (1 + jnp.cos(jnp.pi * frac))
            lr = end * base + (base - end * base) * cos
            warm = jnp.where(
                count < warmup_iters,
                warmup_factor * (1 - count / max(warmup_iters, 1)) + count / max(warmup_iters, 1),
                1.0,
            )
            return lr * warm

        return schedule

    raise ValueError(f"Unknown LR scheduler {name}")


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg)
    labels = param_labels(params, cfg.MODEL.BACKBONE.FREEZE_AT)

    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
    if wd_bias is None:
        wd_bias = wd
    momentum = cfg.SOLVER.MOMENTUM
    opt_name = cfg.SOLVER.OPTIMIZER.upper()

    def sgd_chain(lr_mult: float, weight_decay: float):
        chain = []
        if weight_decay > 0:
            chain.append(optax.add_decayed_weights(weight_decay))
        if opt_name == "SGD":
            chain.append(optax.sgd(
                learning_rate=lambda c: schedule(c) * lr_mult,
                momentum=momentum,
                nesterov=cfg.SOLVER.NESTEROV,
            ))
        elif opt_name == "ADAMW":
            chain.append(
                optax.adamw(learning_rate=lambda c: schedule(c) * lr_mult, weight_decay=0.0)
            )
        else:
            raise ValueError(f"Unknown optimizer {opt_name}")
        return optax.chain(*chain)

    transforms = {
        "default": sgd_chain(1.0, wd),
        "bias": sgd_chain(cfg.SOLVER.BIAS_LR_FACTOR, wd_bias),
        "backbone": sgd_chain(cfg.SOLVER.BACKBONE_MULTIPLIER, wd),
        "frozen": optax.set_to_zero(),
    }
    tx = optax.multi_transform(transforms, labels)

    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value":
            clip = optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        else:
            clip = optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        tx = optax.chain(clip, tx)

    if cfg.WSOVOD.ITER_SIZE > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.WSOVOD.ITER_SIZE)
    return tx


def auto_scale_workers(cfg, num_workers: int):
    """d2 ``auto_scale_workers`` (``engine/defaults.py:422-444``): when
    running on fewer chips than REFERENCE_WORLD_SIZE, scale LR down and
    ITER_SIZE up so the effective batch matches the reference recipe."""
    old_world = cfg.SOLVER.REFERENCE_WORLD_SIZE
    if old_world == 0 or old_world == num_workers:
        return cfg
    cfg = cfg.clone()
    frozen = cfg.is_frozen()
    if frozen:
        cfg.defrost()
    assert old_world % num_workers == 0 or num_workers % old_world == 0
    scale = old_world / num_workers
    cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR / scale
    cfg.WSOVOD.ITER_SIZE = int(round(cfg.WSOVOD.ITER_SIZE * scale))
    cfg.SOLVER.REFERENCE_WORLD_SIZE = num_workers
    if frozen:
        cfg.freeze()
    return cfg
