"""Multi-host (multi-process) utilities.

Reference equivalents: d2 ``launch`` + DDP process groups
(``/root/reference/tools/train_net.py:83-90``,
``/root/reference/wsovod/engine/defaults.py:135-153``) and the evaluators'
rank-gather (``/root/reference/wsovod/evaluation/coco_evaluation.py:182-188``,
``pascal_voc_evaluation.py:75-81``; ``comm.all_gather_object`` in
``tools/generate_sam_proposals_cuda.py:109-119``).

TPU-native mapping: one JAX process per host of a slice, connected by
``jax.distributed.initialize``; gradient all-reduce is XLA's automatic psum
over ICI/DCN (no explicit comm here); host-side object gathers ride
``multihost_utils.process_allgather`` over pickled byte buffers.

Single-process (incl. the virtual 8-device CPU mesh) degenerates to no-ops,
so every call site is exercised by the test suite and ``dryrun_multichip``.
"""

from __future__ import annotations

import pickle
from typing import Any, List, Optional

import jax
import numpy as np


def initialize_from_args(
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url: str = "auto",
    local_device_ids: Optional[List[int]] = None,
) -> None:
    """``jax.distributed.initialize`` driven by the reference CLI surface
    (--num-machines / --machine-rank / --dist-url). With one machine and no
    cluster env this is a no-op — single-process SPMD needs no coordinator.

    ``dist_url`` accepts ``tcp://host:port`` / ``host:port`` / ``auto``
    ("auto" defers to cluster auto-detection: TPU metadata, or the
    JAX_COORDINATOR_ADDRESS / standard cluster envs)."""
    import os

    auto_env = any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if num_machines <= 1 and not auto_env:
        return
    # Must not touch the XLA backend before initialize(): jax.process_count()
    # would instantiate the local backend and make initialize() raise. Use the
    # client-state query instead (advisor round-2 high finding).
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if dist_url and dist_url != "auto":
        addr = dist_url.removeprefix("tcp://")
        kwargs = dict(
            coordinator_address=addr,
            num_processes=num_machines,
            process_id=machine_rank,
        )
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize(name: str = "barrier") -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process (torch
    ``all_gather_object`` equivalent). Returns a list indexed by process."""
    n = jax.process_count()
    if n == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64)
    ).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)  # [n, max_size]
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes()) for i in range(n)
    ]


def gather_to_main(obj: Any) -> Optional[List[Any]]:
    """All-gather, but only the main process keeps the result (d2
    ``comm.gather(..., dst=0)`` shape). Returns None off-main."""
    out = all_gather_objects(obj)
    return out if is_main_process() else None


def to_global_batch(batch: dict, mesh, axis: str = "data") -> dict:
    """Form the global sharded batch from this host's local slice.

    Single-process: plain device_put with a NamedSharding. Multi-process:
    every host contributes its local batch (global batch = concat over hosts
    along the leading axis) via ``host_local_array_to_global_array``."""
    from ..parallel.mesh import shard_batch

    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis)
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    return multihost_utils.host_local_array_to_global_array(batch, mesh, P(axis))
