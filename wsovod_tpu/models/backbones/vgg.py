"""VGG16-DC5 backbone (flax, NHWC), with optional MRRP plain5 stage.

Mirrors reference ``wsovod/modeling/backbone/vgg.py:34-243``: five "plain"
conv stages (2,2,3,3,3 convs; conv+bias, no norm, ReLU after each), 2x2
max-pool after plain1..plain4. With ``CONV5_DILATION == 2`` (DC5), plain4's
pool has stride 1 — note the reference applies MaxPool2d(2, stride=1) with NO
padding there, shrinking H/W by one pixel; we reproduce that exactly — and
plain5 runs dilation-2 convs, total stride 8.

MRRP variant (``vgg_mrrp.py:128-408``): plain5's convs become shared-weight
multi-dilation branches, concatenated along the batch axis.
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..layers import ConvNorm


class PlainBlock(nn.Module):
    out_channels: int
    num_conv: int = 3
    dilation: int = 1
    pool_stride: int = 2
    has_pool: bool = True

    @nn.compact
    def __call__(self, x, dilation: int | None = None):
        d = self.dilation if dilation is None else dilation
        for i in range(self.num_conv):
            x = nn.relu(
                ConvNorm(
                    self.out_channels, 3, norm="", use_bias=True, name=f"conv{i + 1}"
                )(x, dilation=d)
            )
        if self.has_pool:
            # reference VGG uses an unpadded 2x2 pool even at stride 1
            x = nn.max_pool(
                x, (2, 2), strides=(self.pool_stride, self.pool_stride), padding="VALID"
            )
        return x


class VGG16(nn.Module):
    conv5_dilation: int = 1
    out_features: Sequence[str] = ("plain5",)
    # MRRP
    mrrp_on: bool = False
    mrrp_num_branch: int = 3
    mrrp_dilations: Sequence[int] = (1, 2, 3)
    mrrp_stage: str = "plain5"
    mrrp_test_branch_idx: int = 1

    _PLAN = [
        # (name, channels, num_conv)
        ("plain1", 64, 2),
        ("plain2", 128, 2),
        ("plain3", 256, 3),
        ("plain4", 512, 3),
        ("plain5", 512, 3),
    ]

    def output_channels(self) -> Dict[str, int]:
        return {n: c for n, c, _ in self._PLAN if n in self.out_features}

    def output_strides(self) -> Dict[str, int]:
        strides = {"plain1": 2, "plain2": 4, "plain3": 8}
        s45 = 8 if self.conv5_dilation == 2 else 16
        strides["plain4"] = s45
        strides["plain5"] = s45
        return {k: v for k, v in strides.items() if k in self.out_features}

    @nn.compact
    def __call__(self, x, train: bool = False):
        outputs: Dict[str, jnp.ndarray] = {}
        for name, ch, n_conv in self._PLAN:
            if name == "plain4":
                pool_stride = 1 if self.conv5_dilation == 2 else 2
                block = PlainBlock(ch, n_conv, pool_stride=pool_stride, name=name)
            elif name == "plain5":
                block = PlainBlock(
                    ch, n_conv, dilation=self.conv5_dilation, has_pool=False, name=name
                )
            else:
                block = PlainBlock(ch, n_conv, pool_stride=2, name=name)

            if self.mrrp_on and name == self.mrrp_stage:
                if train or self.mrrp_test_branch_idx < 0:
                    x = jnp.concatenate(
                        [block(x, dilation=d) for d in self.mrrp_dilations], axis=0
                    )
                else:
                    x = block(x, dilation=self.mrrp_dilations[self.mrrp_test_branch_idx])
            else:
                x = block(x)
            if name in self.out_features:
                outputs[name] = x
        return outputs


def build_vgg_backbone(cfg) -> VGG16:
    mrrp = cfg.MODEL.MRRP
    assert cfg.MODEL.VGG.DEPTH == 16
    return VGG16(
        conv5_dilation=cfg.MODEL.VGG.CONV5_DILATION,
        out_features=tuple(cfg.MODEL.VGG.OUT_FEATURES),
        mrrp_on=mrrp.MRRP_ON,
        mrrp_num_branch=mrrp.NUM_BRANCH,
        mrrp_dilations=tuple(mrrp.BRANCH_DILATIONS),
        mrrp_stage=mrrp.MRRP_STAGE,
        mrrp_test_branch_idx=mrrp.TEST_BRANCH_IDX,
    )
