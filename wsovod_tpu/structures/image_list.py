"""Padded image batches (d2 ``ImageList`` equivalent, static shapes).

Batches are a single padded ``[B, H, W, C]`` array (NHWC — the TPU-friendly
conv layout) plus per-image true ``(h, w)`` sizes. Padding to a size bucket
happens on the host in the data pipeline; this structure just carries the
result through jit.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class ImageList:
    def __init__(self, tensor: jnp.ndarray, image_sizes: jnp.ndarray):
        self.tensor = tensor  # [B, H, W, C], padded
        self.image_sizes = image_sizes  # [B, 2] int32 (h, w) true sizes

    def tree_flatten(self):
        return (self.tensor, self.image_sizes), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __len__(self):
        return self.tensor.shape[0]

    @property
    def padded_size(self) -> Tuple[int, int]:
        return self.tensor.shape[1], self.tensor.shape[2]

    @staticmethod
    def from_tensors(
        tensors: Sequence[np.ndarray],
        size_divisibility: int = 32,
        pad_value: float = 0.0,
        pad_to: Tuple[int, int] | None = None,
    ) -> "ImageList":
        """Host-side batching: pad HWC images to a common (bucketed) size."""
        sizes = np.array([[t.shape[0], t.shape[1]] for t in tensors], dtype=np.int32)
        if pad_to is None:
            h = int(sizes[:, 0].max())
            w = int(sizes[:, 1].max())
        else:
            h, w = pad_to
        if size_divisibility > 1:
            h = int(np.ceil(h / size_divisibility) * size_divisibility)
            w = int(np.ceil(w / size_divisibility) * size_divisibility)
        batch = np.full(
            (len(tensors), h, w, tensors[0].shape[2]), pad_value, dtype=np.float32
        )
        for i, t in enumerate(tensors):
            batch[i, : t.shape[0], : t.shape[1], :] = t
        return ImageList(jnp.asarray(batch), jnp.asarray(sizes))

    def valid_pixel_mask(self) -> jnp.ndarray:
        """[B, H, W] bool mask of non-padding pixels."""
        h_idx = jnp.arange(self.tensor.shape[1])[None, :, None]
        w_idx = jnp.arange(self.tensor.shape[2])[None, None, :]
        return (h_idx < self.image_sizes[:, 0, None, None]) & (
            w_idx < self.image_sizes[:, 1, None, None]
        )
