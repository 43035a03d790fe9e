"""Functional train step + loop (replaces d2 SimpleTrainer/DDP).

Reference ``wsovod/engine/trainer.py:24-207``: per-step forward -> sum losses
-> backward -> step every ITER_SIZE iterations (gradient accumulation), with
skip-empty-target batches handled on the host side of the data pipeline.

Here the step is a pure function jitted once over a data mesh: parameters
replicated, batch sharded on the leading axis; the gradient all-reduce rides
ICI via XLA's automatic collectives (no DDP object). ITER_SIZE accumulation
is ``optax.MultiSteps`` inside the optimizer.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from ..parallel.mesh import batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


def create_train_state(params, tx: optax.GradientTransformation, rng) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params["params"] if "params" in params else params),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    loss_scale: float = 1.0,
    with_vis: bool = False,
    **apply_kwargs,
) -> Callable:
    """Returns jitted ``(state, batch, embeddings) -> (state, metrics)``
    (``-> (state, metrics, vis)`` when ``with_vis``: the ROI heads' sown
    "vis" collection — the mined pseudo GT of the step, tiny [B, G, .]
    arrays the trainer draws host-side every VIS_PERIOD iters).

    ``apply_kwargs`` are static extras forwarded to ``model.apply`` (e.g.
    ``source_id`` for the mixed-datasets meta-arch — one compiled step per
    dataset)."""

    def step_fn(state: TrainState, batch: Dict, embeddings):
        rng = jax.random.fold_in(state.rng, state.step)
        rng, dropout_rng, model_rng = jax.random.split(rng, 3)

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                batch,
                train=True,
                iteration=state.step,
                rng=model_rng,
                embeddings=embeddings,
                rngs={"dropout": dropout_rng},
                mutable=["vis"] if with_vis else False,
                **apply_kwargs,
            )
            losses, vis = out if with_vis else (out, {})
            total = sum(jnp.asarray(v) for v in losses.values()) * loss_scale
            return total, (losses, vis)

        params = state.params["params"] if "params" in state.params else state.params
        (total, (losses, vis)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {"total_loss": total, **losses}
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            params={"params": new_params} if "params" in state.params else new_params,
            opt_state=opt_state,
            step=state.step + 1,
        )
        if with_vis:
            return new_state, metrics, vis
        return new_state, metrics

    n_out = 3 if with_vis else 2
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, data, rep),
        out_shardings=(rep,) * n_out,
        donate_argnums=(0,),
    )
