"""Shared NN building blocks (flax.linen, NHWC).

FrozenBatchNorm matches d2's ``FrozenBN`` (reference backbones are trained
with frozen stats and FREEZE_AT=5 in all shipped configs, e.g.
``configs/COCO-Detection/WSOVOD_WSR_18_DC5_1x.yaml:6``), so batch statistics
are parameters, never updated by the forward pass. Gradient freezing is done
at the optimizer level (zero-LR label for frozen prefixes), keeping the model
function pure.
"""

from __future__ import annotations

import functools
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
    # "int8": shift-decomposed int8 GEMM conv at stride 1 (inference-scale
    # quantization; round() has zero gradient, so enable only with a frozen
    # backbone — every shipped config has FREEZE_AT=5). Other shapes fall
    # through to the fp conv. Set via TPU.BACKBONE_CONV_QUANT.
    # MEASURED A NET LOSS as the backbone default on v5e (62.6 vs 39.3 ms,
    # scripts/bench_backbone_int8.py): ~30 thin convs each pay an
    # activation-quantize read+write that swamps the 2x MXU rate — unlike
    # the single fat RPN conv where the same decomposition won 38 -> 29.
    quant: str = "none"

    @nn.compact
    def __call__(self, x, dilation: int | None = None):
        d = self.dilation if dilation is None else dilation
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k, k, x.shape[-1] // self.groups, self.features),
        )
        if (
            self.quant == "int8"
            and self.stride == 1
            and self.groups == 1
            and k in (1, 3)
        ):
            conv = conv1x1_int8 if k == 1 else functools.partial(
                conv3x3_shifted_int8, dilation=d
            )
            x = conv(x, kernel)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.features,))
                x = x + bias.astype(x.dtype)
            norm = get_norm(self.norm, self.features)
            return norm(x) if norm is not None else x
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


def _quantize_act_weight(x, kernel):
    """Symmetric dynamic int8 quantization: per-image activation scales and
    per-output-channel weight scales (weight reduce over all but the last
    axis)."""
    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)  # [B,1,1,1]
    s_x = jnp.where(s_x > 1e-20, s_x / 127.0, 1.0)
    xq = jnp.round(xf / s_x).astype(jnp.int8)
    kf = kernel.astype(jnp.float32)
    s_k = jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1))) / 127.0  # [F]
    s_k = jnp.where(s_k > 1e-20, s_k, 1.0)
    kq = jnp.clip(jnp.round(kf / s_k), -127, 127).astype(jnp.int8)
    return xq, s_x, kq, s_k


def conv3x3_shifted_int8(
    x: jnp.ndarray,  # [B, H, W, C]
    kernel: jnp.ndarray,  # [3, 3, C, F]
    bias: Optional[jnp.ndarray] = None,  # [F]
    dilation: int = 1,
) -> jnp.ndarray:
    """3x3 SAME conv (optionally dilated — the DC5/MRRP res5 form) as 9
    shifted int8 GEMMs accumulated in int32.

    On v5e, XLA's int8 convolution lowers at the bf16 MXU rate (measured: no
    speedup), but int8 ``dot_general`` hits ~1.9x — so the conv is decomposed
    into 9 shifted [B*H*W, C] x [C, F] GEMMs instead. Quantization is
    symmetric dynamic: per-image activation scales (shared across all 9
    shifts so the int32 accumulation stays exact until one final dequant) and
    per-output-channel weight scales (fold after the contraction).
    """
    b, h, w, _ = x.shape
    xq, s_x, kq, s_k = _quantize_act_weight(x, kernel)
    d = dilation
    xp = jnp.pad(xq, ((0, 0), (d, d), (d, d), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = xp[:, dy * d : dy * d + h, dx * d : dx * d + w, :]
            t = jnp.einsum(
                "bhwc,cf->bhwf", sl, kq[dy, dx],
                preferred_element_type=jnp.int32,
            )
            acc = t if acc is None else acc + t
    y = acc.astype(jnp.float32) * s_x * s_k[None, None, None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def conv1x1_int8(
    x: jnp.ndarray,  # [B, H, W, C]
    kernel: jnp.ndarray,  # [1, 1, C, F]
    bias: Optional[jnp.ndarray] = None,  # [F]
) -> jnp.ndarray:
    """1x1 conv as a single int8 GEMM (the res5 bottleneck 1x1s are ~60% of
    the R50 backbone MACs; int8 dot_general runs at 2x the bf16 MXU rate)."""
    xq, s_x, kq, s_k = _quantize_act_weight(x, kernel)
    y = jnp.einsum(
        "bhwc,cf->bhwf", xq, kq[0, 0], preferred_element_type=jnp.int32
    )
    y = y.astype(jnp.float32) * s_x * s_k[None, None, None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class QuantizableConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(F, (3, 3), padding='SAME')`` (identical param
    tree: ``kernel`` [3,3,C,F] + ``bias`` [F]) with an opt-in int8
    inference path (``conv3x3_shifted_int8``)."""

    features: int
    quant: str = "none"
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.quant == "int8":
            return conv3x3_shifted_int8(x, kernel, bias)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)


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
