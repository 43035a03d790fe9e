"""Swin Transformer backbone (flax, NHWC).

Standard Swin-T/S (reference ``wsovod/modeling/backbone/swin_transformer.py:20-697``:
4 stages of windowed attention blocks with shifted windows, relative position
bias, patch merging downsampling; optional absolute position embedding).
Registered-but-unused by the shipped WSOVOD configs; provided for API parity.

TPU notes: window partition is a reshape/transpose (static 7x7 windows), the
attention is a small batched MXU matmul per window; inputs are padded to
window multiples with masked attention on padding.
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nH*nW, ws*ws, C] (H, W divisible by ws)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(win: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = win.shape[0] // (h // ws * (w // ws))
    x = win.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # [ws*ws, ws*ws]


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7

    @nn.compact
    def __call__(self, x, mask=None):
        b, n, c = x.shape
        h = self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x).reshape(b, n, 3, h, c // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, D]
        scale = (c // h) ** -0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        rpi = jnp.asarray(_relative_position_index(self.window_size))
        bias = rpb_table[rpi.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.reshape(b, h, n, n)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, h: int, w: int):
        b, l, c = x.shape
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        x = x.reshape(b, h, w, c)

        ws = self.window_size
        pad_h = (-h) % ws
        pad_w = (-w) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w

        mask = None
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -self.shift), slice(-self.shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -self.shift), slice(-self.shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws).reshape(-1, ws * ws)
            mask = jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)

        win = window_partition(x, ws)
        win = WindowAttention(self.dim, self.num_heads, ws, name="attn")(win, mask)
        x = window_reverse(win, ws, hp, wp)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :h, :w].reshape(b, l, c)
        x = shortcut + x

        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, h: int, w: int):
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        pad_h, pad_w = h % 2, w % 2
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        nh, nw = (h + pad_h) // 2, (w + pad_w) // 2
        x = x.reshape(b, nh * nw, 4 * c)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x), nh, nw


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    ape: bool = False
    patch_norm: bool = True
    out_features: Sequence[str] = ("stage2", "stage3", "stage4", "stage5")

    def output_channels(self) -> Dict[str, int]:
        chans = {
            f"stage{i + 2}": self.embed_dim * (2 ** i) for i in range(len(self.depths))
        }
        return {k: v for k, v in chans.items() if k in self.out_features}

    def output_strides(self) -> Dict[str, int]:
        strides = {f"stage{i + 2}": 4 * (2 ** i) for i in range(len(self.depths))}
        return {k: v for k, v in strides.items() if k in self.out_features}

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        # patch embed: 4x4 conv
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), name="patch_embed")(x)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(b, h * w, self.embed_dim)
        if self.patch_norm:
            x = nn.LayerNorm(name="patch_norm")(x)

        outputs = {}
        dim = self.embed_dim
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else self.window_size // 2
                x = SwinBlock(
                    dim, self.num_heads[si], self.window_size, shift, self.mlp_ratio,
                    name=f"stage{si + 2}_block{bi}",
                )(x, h, w)
            name = f"stage{si + 2}"
            if name in self.out_features:
                feat = nn.LayerNorm(name=f"{name}_norm")(x)
                outputs[name] = feat.reshape(b, h, w, dim)
            if si < len(self.depths) - 1:
                x, h, w = PatchMerging(dim, name=f"merge{si + 2}")(x, h, w)
                dim *= 2
        return outputs


def build_swin_backbone(cfg) -> SwinTransformer:
    s = cfg.MODEL.SWIN
    return SwinTransformer(
        embed_dim=s.EMBED_DIM,
        depths=tuple(s.DEPTHS),
        num_heads=tuple(s.NUM_HEADS),
        window_size=s.WINDOW_SIZE,
        mlp_ratio=float(s.MLP_RATIO),
        ape=s.APE,
        patch_norm=s.PATH_NORM,
        out_features=tuple(s.OUT_FEATURES),
    )


class SwinFPN(nn.Module):
    """FPN over a Swin bottom-up (d2 ``FPN`` + ``LastLevelMaxPool`` semantics,
    reference ``wsovod/modeling/backbone/swin_transformer.py:679-697``).

    Lateral 1x1 convs project each bottom-up stage to ``out_channels``; the
    top-down path upsamples (nearest 2x) and sums (``fuse_type='avg'`` halves
    the sum); each fused map passes a 3x3 output conv. ``LastLevelMaxPool``
    appends a stride-2 max pool of the last output as p6.
    """

    bottom_up: SwinTransformer
    in_features: Sequence[str] = ("stage2", "stage3", "stage4", "stage5")
    out_channels: int = 256
    fuse_type: str = "sum"
    top_block: bool = True  # LastLevelMaxPool -> extra p{N+1} level

    def output_strides(self) -> Dict[str, int]:
        bu = self.bottom_up.output_strides()
        strides = {}
        for f in self.in_features:
            s = bu[f]
            strides[f"p{int(np.log2(s))}"] = s
        if self.top_block:
            top = max(strides.values()) * 2
            strides[f"p{int(np.log2(top))}"] = top
        return strides

    def output_channels(self) -> Dict[str, int]:
        return {k: self.out_channels for k in self.output_strides()}

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.bottom_up(x, train=train)
        bu_strides = self.bottom_up.output_strides()
        # top-down order: coarsest first
        names = sorted(self.in_features, key=lambda f: -bu_strides[f])
        prev = None
        outputs = {}
        for f in names:
            lateral = nn.Conv(
                self.out_channels, (1, 1), name=f"fpn_lateral_{f}"
            )(feats[f])
            if prev is not None:
                up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
                up = up[:, : lateral.shape[1], : lateral.shape[2]]
                lateral = lateral + up
                if self.fuse_type == "avg":
                    lateral = lateral / 2.0
            prev = lateral
            out = nn.Conv(
                self.out_channels, (3, 3), padding="SAME", name=f"fpn_output_{f}"
            )(lateral)
            outputs[f"p{int(np.log2(bu_strides[f]))}"] = out
        if self.top_block:
            coarsest = outputs[f"p{int(np.log2(bu_strides[names[0]]))}"]
            outputs[f"p{int(np.log2(bu_strides[names[0]])) + 1}"] = nn.max_pool(
                coarsest, (1, 1), strides=(2, 2)
            )
        return outputs


def build_swin_fpn_backbone(cfg) -> SwinFPN:
    return SwinFPN(
        bottom_up=build_swin_backbone(cfg),
        in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
    )
