"""DiscriminativeAdaptationNeck (DAN) box head.

Reference ``wsovod/modeling/roi_heads/box_head.py:18-106``: optional 3x3
convs (0 in all shipped configs) then FC layers DAN_DIM=[4096, 4096], each
ReLU + Dropout(0.5). The two 4096-d FCs over up-to-12k pooled ROIs per image
are the hottest GEMMs in the model — on TPU they run as one batched
``[B*P, 7*7*C] x [7*7*C, 4096]`` matmul on the MXU.

Flatten order note: torch flattens pooled NCHW features as (c, h, w); we keep
NHWC and flatten as (h, w, c). The weight importer permutes fc1 accordingly.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvNorm


class DiscriminativeAdaptationNeck(nn.Module):
    conv_dims: Sequence[int] = ()
    fc_dims: Sequence[int] = (4096, 4096)
    conv_norm: str = ""
    dropout_rate: float = 0.5
    dtype: str | None = None  # compute dtype for the FC GEMMs (None = f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        """x: [..., P, P, C] pooled features -> [..., fc_dims[-1]]."""
        for i, d in enumerate(self.conv_dims):
            x = nn.relu(
                ConvNorm(
                    d, 3, norm=self.conv_norm, use_bias=not self.conv_norm,
                    name=f"conv{i + 1}",
                )(x)
            )
        for i, d in enumerate(self.fc_dims):
            if i == 0:
                # contract (h, w, c) directly — a reshape to [*, h*w*c] would
                # force a physical relayout of the 1GB pooled tensor on TPU
                x = nn.DenseGeneral(
                    d,
                    axis=(-3, -2, -1),
                    dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.005),
                    bias_init=nn.initializers.constant(0.1),
                    name="fc1",
                )(x)
                x = nn.relu(x)
            else:
                x = nn.relu(
                    nn.Dense(
                        d,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.005),
                        bias_init=nn.initializers.constant(0.1),
                        name=f"fc{i + 1}",
                    )(x)
                )
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x

    @property
    def output_dim(self) -> int:
        return self.fc_dims[-1] if self.fc_dims else self.conv_dims[-1]


def build_box_head(cfg) -> DiscriminativeAdaptationNeck:
    assert cfg.MODEL.ROI_BOX_HEAD.NAME == "DiscriminativeAdaptationNeck"
    return DiscriminativeAdaptationNeck(
        conv_dims=tuple([cfg.MODEL.ROI_BOX_HEAD.CONV_DIM] * cfg.MODEL.ROI_BOX_HEAD.NUM_CONV),
        fc_dims=tuple(cfg.MODEL.ROI_BOX_HEAD.DAN_DIM),
        conv_norm=cfg.MODEL.ROI_BOX_HEAD.NORM,
        dtype=cfg.TPU.COMPUTE_DTYPE if cfg.TPU.COMPUTE_DTYPE != "float32" else None,
    )
