"""Trainer hooks: parameter-norm inspection + expected-results verification.

Reference ``wsovod/engine/hooks.py:48-70`` (ParametersNormInspectHook: every
``period`` iterations log the p-norm of every named parameter) and d2's
``verify_results`` (``TEST.EXPECTED_RESULTS`` assertion used via
``engine/defaults.py:240-244``).
"""

from __future__ import annotations

import logging
from typing import Dict

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


class ParametersNormInspectHook:
    def __init__(self, period: int = 10, p: int = 2):
        self.period = period
        self.p = p
        self._norm_fn = jax.jit(
            lambda params: {
                jax.tree_util.keystr(kp): jnp.linalg.norm(
                    jnp.ravel(v).astype(jnp.float32), ord=self.p
                )
                for kp, v in jax.tree_util.tree_leaves_with_path(params)
            }
        )

    def after_step(self, iteration: int, params, storage) -> None:
        if (iteration + 1) % self.period != 0:
            return
        norms = jax.device_get(self._norm_fn(params))
        for name, val in norms.items():
            storage.put_scalar(f"norm{self.p}{name}", float(val))


def verify_results(cfg, results: Dict[str, Dict]) -> bool:
    """Assert final metrics within tolerance (d2 TEST.EXPECTED_RESULTS:
    a list of [task, metric, expected, tolerance])."""
    expected = cfg.TEST.EXPECTED_RESULTS
    if not expected:
        return True
    ok = True
    # results: {dataset: {task: {metric: value}}} — check the first dataset
    flat = next(iter(results.values())) if results else {}
    for task, metric, expect, tol in expected:
        actual = flat.get(task, {}).get(metric)
        if actual is None:
            logger.error("expected metric %s/%s missing", task, metric)
            ok = False
            continue
        if abs(actual - expect) > tol:
            logger.error(
                "%s/%s = %.4f, expected %.4f +/- %.4f", task, metric, actual, expect, tol
            )
            ok = False
        else:
            logger.info("%s/%s = %.4f OK (expected %.4f +/- %.4f)",
                        task, metric, actual, expect, tol)
    return ok


def precise_bn_update(model, params, batches, apply_kwargs=None, num_iter=None):
    """PreciseBN (d2 hook, reference ``engine/defaults.py:190-201``): recompute
    BN statistics as the plain average of per-batch mean/var over ``batches``
    (fvcore ``update_bn_stats`` semantics) and write them back into the frozen
    ``mean``/``var`` parameters.

    Works with this codebase's FrozenBatchNorm design (stats are params):
    the forward pass sows per-batch statistics into the ``precise_bn``
    collection when it is mutable. Returns updated params; a model with no BN
    layers is returned unchanged.
    """
    import flax

    apply_kwargs = dict(apply_kwargs or {})
    sums = None
    count = 0
    for i, batch in enumerate(batches):
        if num_iter is not None and i >= num_iter:
            break
        # drop any stale sown collection from the variables before applying
        clean = {k: v for k, v in params.items() if k != "precise_bn"}
        _, col = model.apply(clean, batch, mutable=["precise_bn"], **apply_kwargs)
        stats = flax.core.unfreeze(col.get("precise_bn", {}))
        # sow stores a tuple of sown values per call site; take the freshest
        leaves = jax.tree_util.tree_map(
            lambda t: t[-1] if isinstance(t, tuple) else t,
            stats,
            is_leaf=lambda t: isinstance(t, tuple),
        )
        sums = (
            leaves
            if sums is None
            else jax.tree_util.tree_map(lambda a, b: a + b, sums, leaves)
        )
        count += 1
    if not sums or count == 0:
        return params
    avg = jax.tree_util.tree_map(lambda a: a / count, sums)

    was_frozen = isinstance(params, flax.core.FrozenDict)
    p = flax.core.unfreeze(params)

    def write(node_stats, node_params):
        for k, v in node_stats.items():
            if k == "stats":
                node_params["mean"] = v[0].astype(node_params["mean"].dtype)
                node_params["var"] = jnp.maximum(v[1], 0.0).astype(
                    node_params["var"].dtype
                )
            elif k in node_params:
                write(v, node_params[k])

    write(avg, p["params"])
    return flax.core.freeze(p) if was_frozen else p
