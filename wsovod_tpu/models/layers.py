"""Shared NN building blocks (flax.linen, NHWC).

FrozenBatchNorm matches d2's ``FrozenBN`` (reference backbones are trained
with frozen stats and FREEZE_AT=5 in all shipped configs, e.g.
``configs/COCO-Detection/WSOVOD_WSR_18_DC5_1x.yaml:6``), so batch statistics
are parameters, never updated by the forward pass. Gradient freezing is done
at the optimizer level (zero-LR label for frozen prefixes), keeping the model
function pure.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """Affine transform using stored statistics: y = (x - mean)/sqrt(var+eps)*g + b."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        scale = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        mean = self.param("mean", nn.initializers.zeros, shape)
        var = self.param("var", nn.initializers.ones, shape)
        # PreciseBN support (d2 hook, reference engine/defaults.py:190-201):
        # when the caller makes the 'precise_bn' collection mutable, sow this
        # batch's input statistics so the hook can recompute mean/var params
        # from data (frozen stats are params here, not batch_stats).
        if self.is_mutable_collection("precise_bn") and not self.is_initializing():
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            bmean = jnp.mean(xf, axis=axes)
            bvar = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(bmean)
            self.sow("precise_bn", "stats", jnp.stack([bmean, bvar]))
        # Fold into a single scale/shift (XLA fuses this into the conv).
        # Cast to the activation dtype so frozen stats don't upcast a bf16
        # compute path back to f32.
        mul = (scale / jnp.sqrt(var + self.eps)).astype(x.dtype)
        add = (bias - mean * (scale / jnp.sqrt(var + self.eps))).astype(x.dtype)
        return x * mul + add


def get_norm(norm: str, features: int) -> Optional[nn.Module]:
    if norm in ("", "none", None):
        return None
    if norm in ("BN", "FrozenBN", "SyncBN"):
        # All reference checkpoints run the backbone with frozen statistics.
        return FrozenBatchNorm(features)
    raise ValueError(f"Unsupported norm: {norm}")


class ConvNorm(nn.Module):
    """Conv2D (no bias) + optional frozen norm, matching d2's Conv2d(norm=...).

    ``dilation`` may be overridden at call time with shared weights — this is
    how MRRP's multi-branch shared-weight dilated convolutions are expressed
    (reference ``mrrp_conv.py:10-107``: one weight, N dilations).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    norm: str = "FrozenBN"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, dilation: int | None = None):
        d = self.dilation if dilation is None else dilation
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k, k, x.shape[-1] // self.groups, self.features),
        )
        pad = d * (k - 1) // 2
        x = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            x = x + bias.astype(x.dtype)
        norm = get_norm(self.norm, self.features)
        if norm is not None:
            x = norm(x)
        return x


def max_pool_2x2(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """2x2 max pool. For stride 1, pad right/bottom by one (the reference's
    ``ZeroPad2d((0,1,0,1)) + MaxPool2d(2, 1)`` trick, ``resnet_wsl.py:96-103``)
    so spatial size is preserved."""
    if stride == 1:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=0)
        return nn.max_pool(x, (2, 2), strides=(1, 1), padding="VALID")
    return nn.max_pool(x, (2, 2), strides=(stride, stride), padding="VALID")


class MLP(nn.Module):
    """FC stack with configurable activations/dropout (used by heads)."""

    dims: Sequence[int]
    activation: Callable = nn.relu
    dropout_rate: float = 0.0
    final_activation: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, name=f"fc{i + 1}")(x)
            if i < len(self.dims) - 1 or self.final_activation:
                x = self.activation(x)
                if self.dropout_rate > 0:
                    x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x
