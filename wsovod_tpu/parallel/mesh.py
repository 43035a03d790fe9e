"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data parallelism over NCCL
(SURVEY.md §2.13). TPU-native equivalent: a 1-D ``data`` mesh with
``jax.sharding.NamedSharding``; parameters are replicated, batches are
sharded on the leading axis, and XLA inserts the gradient ``psum`` over ICI
automatically when the loss is computed under ``jit`` with these shardings.
The mesh shape is config-driven (``TPU.MESH_SHAPE`` / ``TPU.MESH_AXES``) so
future model-parallel axes slot in without touching the train step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    mesh_shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    # an explicit shape smaller than the device count selects a subset mesh
    # (e.g. a B=2 debug run on an 8-device virtual CPU host)
    want = int(np.prod(shape))
    if want < len(devices):
        devices = devices[:want]
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place each leaf on the mesh, sharded along its leading dim."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    if jax.process_count() > 1:
        # multi-controller: the mesh spans non-addressable devices, so a
        # plain device_put is rejected; every host holds the same value
        # (deterministic init / checkpoint), which is exactly the
        # host-local -> global replicated contract
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec

        return multihost_utils.host_local_array_to_global_array(
            tree, mesh, PartitionSpec()
        )
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
