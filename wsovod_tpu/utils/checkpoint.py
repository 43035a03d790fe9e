"""Checkpointing: orbax save/restore + d2-pickle weight import.

Replaces d2 ``DetectionCheckpointer`` (reference ``engine/defaults.py:123-171``):
``resume_or_load`` honours a ``last_checkpoint`` marker, else imports
``MODEL.WEIGHTS`` (a DRN-WSOD d2 pickle or torch checkpoint) freshly;
``PeriodicCheckpointer`` and ``BestCheckpointer`` (keyed on ``bbox/AP50``)
semantics live in the trainer loop.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

logger = logging.getLogger(__name__)


class Checkpointer:
    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, state: Any):
        path = self._path(name)
        self._ckptr.save(path, state, force=True)
        # StandardCheckpointer saves asynchronously; block so the marker file
        # never points at a half-written checkpoint (and process exit is safe)
        self._ckptr.wait_until_finished()
        with open(os.path.join(self.directory, "last_checkpoint"), "w") as f:
            f.write(name)
        logger.info("saved checkpoint %s", path)

    def load(self, name: str, template: Any) -> Any:
        return self._ckptr.restore(self._path(name), template)

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.directory, "last_checkpoint"))

    def last_checkpoint_name(self) -> Optional[str]:
        marker = os.path.join(self.directory, "last_checkpoint")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return f.read().strip()

    def resume_or_load(self, state_template: Any, weights_path: str, resume: bool,
                       model_cfg: Optional[dict] = None) -> tuple[Any, bool]:
        """Returns (state, resumed). When not resuming, imports reference
        weights into the template's params if ``weights_path`` is set."""
        if resume and self.has_checkpoint():
            name = self.last_checkpoint_name()
            state = self.load(name, state_template)
            logger.info("resumed from %s", name)
            return state, True
        if weights_path:
            from .weight_import import import_wsovod_model, load_checkpoint_file

            blobs = load_checkpoint_file(weights_path)
            params = import_wsovod_model(
                blobs,
                state_template.params,
                depth=(model_cfg or {}).get("depth", 18),
                pooled_shape=(model_cfg or {}).get("pooled_shape", (512, 7, 7)),
            )
            import jax.numpy as jnp

            import jax

            params = jax.tree_util.tree_map(jnp.asarray, params)
            state = state_template.replace(params=params)
            logger.info("imported weights from %s", weights_path)
            return state, False
        return state_template, False
