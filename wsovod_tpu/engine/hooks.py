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
