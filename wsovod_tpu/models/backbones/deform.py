"""Deformable convolution v1/v2 (gather-based) + DeformBottleneckBlock.

TPU-native equivalent of the reference's ``DeformBottleneckBlock``
(``wsovod/modeling/backbone/resnet_wsl.py``, registered for R50+ stages via
``MODEL.RESNETS.DEFORM_ON_PER_STAGE``; no shipped config enables it).

Deformable conv = for each output position and kernel tap k, bilinearly
sample the input at ``p + p_k + offset_k`` (offsets predicted by a small
conv), optionally scaled by a predicted modulation mask (v2), then contract
with the kernel weights — on TPU this is a batched gather + one einsum on
the MXU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_sample(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """feat [H, W, C]; ys/xs [...] float coords -> [..., C] (zeros outside)."""
    h, w, c = feat.shape
    ok = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y = jnp.clip(ys, 0.0, h - 1)
    x = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    flat = feat.reshape(h * w, c)
    v00 = flat[y0 * w + x0]
    v01 = flat[y0 * w + x1]
    v10 = flat[y1 * w + x0]
    v11 = flat[y1 * w + x1]
    out = (
        v00 * (1 - ly) * (1 - lx)
        + v01 * (1 - ly) * lx
        + v10 * ly * (1 - lx)
        + v11 * ly * lx
    )
    return out * ok[..., None].astype(out.dtype)


class DeformConv(nn.Module):
    """3x3 deformable conv (stride 1, configurable dilation)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    deform_groups: int = 1
    modulated: bool = False  # v2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, cin = x.shape
        k = self.kernel_size
        kk = k * k
        # offset (and mask) predictor — zero-init so it starts as plain conv
        off_ch = 2 * kk * self.deform_groups + (kk * self.deform_groups if self.modulated else 0)
        off = nn.Conv(
            off_ch, (k, k), padding="SAME",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="offset_conv",
        )(x)
        if self.modulated:
            offsets = off[..., : 2 * kk]
            mask = jax.nn.sigmoid(off[..., 2 * kk : 3 * kk])  # [B, H, W, KK]
        else:
            offsets = off[..., : 2 * kk]
            mask = None
        offsets = offsets.reshape(b, h, w, kk, 2)

        d = self.dilation
        taps = jnp.asarray(
            [[(i - k // 2) * d, (j - k // 2) * d] for i in range(k) for j in range(k)],
            jnp.float32,
        )  # [KK, 2] (dy, dx)
        gy = jnp.arange(h, dtype=jnp.float32)[:, None, None]
        gx = jnp.arange(w, dtype=jnp.float32)[None, :, None]
        ys = gy + taps[None, None, :, 0] + offsets[..., 0]  # [B, H, W, KK] (b-broadcast)
        xs = gx + taps[None, None, :, 1] + offsets[..., 1]

        sampled = jax.vmap(_bilinear_sample)(x, ys, xs)  # [B, H, W, KK, Cin]
        if mask is not None:
            sampled = sampled * mask[..., None]

        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (kk, cin, self.features),
        )
        out = jnp.einsum("bhwkc,kcf->bhwf", sampled, kernel.astype(sampled.dtype))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return out + bias.astype(out.dtype)


class DeformBottleneckBlock(nn.Module):
    """Bottleneck with a deformable 3x3 (reference DeformBottleneckBlock)."""

    out_channels: int
    bottleneck_channels: int
    pool_stride: int = 1
    has_pool: bool = False
    dilation: int = 1
    norm: str = "FrozenBN"
    deform_modulated: bool = False
    deform_num_groups: int = 1

    @nn.compact
    def __call__(self, x, dilation: Optional[int] = None):
        from ..layers import ConvNorm, get_norm, max_pool_2x2

        d = self.dilation if dilation is None else dilation
        out = nn.relu(ConvNorm(self.bottleneck_channels, 1, norm=self.norm, name="conv1")(x))
        out = DeformConv(
            self.bottleneck_channels, 3, dilation=d,
            deform_groups=self.deform_num_groups, modulated=self.deform_modulated,
            name="conv2",
        )(out)
        n2 = get_norm(self.norm, self.bottleneck_channels)
        if n2 is not None:
            out = n2(out)
        out = nn.relu(out)
        out = ConvNorm(self.out_channels, 1, norm=self.norm, name="conv3")(out)
        if x.shape[-1] != self.out_channels:
            shortcut = ConvNorm(self.out_channels, 1, norm=self.norm, name="shortcut")(x)
        else:
            shortcut = x
        out = nn.relu(out + shortcut)
        if self.has_pool:
            out = max_pool_2x2(out, self.pool_stride)
        return out
