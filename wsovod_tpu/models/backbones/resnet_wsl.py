"""WSR ("weakly-supervised") ResNet backbone, TPU-native (flax, NHWC).

Reproduces the DRN-WSOD-style ResNet of the reference
(``wsovod/modeling/backbone/resnet_wsl.py``):

* stem = three 3x3 convs (first stride 2) + 2x2 max-pool -> total stride 4
  (reference ``resnet_wsl.py:361-421``);
* residual blocks keep all convs stride 1; downsampling happens in a trailing
  2x2 max-pool on the last block of res2/res3 ("has_pool"), with the stride-1
  variant using a right/bottom zero-pad (``resnet_wsl.py:24-110``);
* stage plan (``resnet_wsl.py:674-706``): dilation = RES5_DILATION on res4 AND
  res5; last-block stride 2 on res2 (and res3 iff RES5_DILATION == 1); R18/34
  use BasicBlock, R50+ use BottleneckBlock.

MRRP ("multi-rate region proposal", ``resnet_wsl_mrrp.py``,
``mrrp_conv.py:10-107``) replaces one stage's convs with shared-weight
multi-dilation branches; the stage output concatenates the branches along the
batch axis, so downstream sees batch ``B * num_branch`` — preserved here
because the pooler/ROI-head contract depends on it.

Weight import from DRN-WSOD d2 pickles is in ``wsovod_tpu/utils/weight_import``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..layers import ConvNorm, max_pool_2x2


class BasicStem(nn.Module):
    out_channels: int = 64
    norm: str = "FrozenBN"

    @nn.compact
    def __call__(self, x):
        x = nn.relu(ConvNorm(self.out_channels, 3, stride=2, norm=self.norm, name="conv1")(x))
        x = nn.relu(ConvNorm(self.out_channels, 3, norm=self.norm, name="conv2")(x))
        x = nn.relu(ConvNorm(self.out_channels, 3, norm=self.norm, name="conv3")(x))
        return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


class BasicBlock(nn.Module):
    out_channels: int
    pool_stride: int = 1  # the original "stride" param; applied via trailing pool
    has_pool: bool = False
    dilation: int = 1
    norm: str = "FrozenBN"
    quant: str = "none"  # int8 shift-GEMM convs (see ConvNorm.quant)

    @nn.compact
    def __call__(self, x, dilation: int | None = None):
        d = self.dilation if dilation is None else dilation
        q = self.quant
        out = nn.relu(ConvNorm(self.out_channels, 3, norm=self.norm, quant=q, name="conv1")(x, dilation=d))
        out = ConvNorm(self.out_channels, 3, norm=self.norm, quant=q, name="conv2")(out, dilation=d)
        if x.shape[-1] != self.out_channels:
            shortcut = ConvNorm(self.out_channels, 1, norm=self.norm, quant=q, name="shortcut")(x)
        else:
            shortcut = x
        out = nn.relu(out + shortcut)
        if self.has_pool:
            out = max_pool_2x2(out, self.pool_stride)
        return out


class BottleneckBlock(nn.Module):
    out_channels: int
    bottleneck_channels: int
    pool_stride: int = 1
    has_pool: bool = False
    dilation: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    quant: str = "none"  # int8 shift-GEMM convs (see ConvNorm.quant)

    @nn.compact
    def __call__(self, x, dilation: int | None = None):
        d = self.dilation if dilation is None else dilation
        q = self.quant
        out = nn.relu(
            ConvNorm(self.bottleneck_channels, 1, norm=self.norm, quant=q, name="conv1")(x)
        )
        out = nn.relu(
            ConvNorm(
                self.bottleneck_channels, 3, groups=self.num_groups,
                norm=self.norm, quant=q, name="conv2"
            )(out, dilation=d)
        )
        out = ConvNorm(self.out_channels, 1, norm=self.norm, quant=q, name="conv3")(out)
        if x.shape[-1] != self.out_channels:
            shortcut = ConvNorm(self.out_channels, 1, norm=self.norm, quant=q, name="shortcut")(x)
        else:
            shortcut = x
        out = nn.relu(out + shortcut)
        if self.has_pool:
            out = max_pool_2x2(out, self.pool_stride)
        return out


class WSRResNet(nn.Module):
    """WSR ResNet-18/34/50/101/152 with optional MRRP stage.

    ``__call__(x)`` returns ``{feature_name: [B(*branches), H, W, C]}``.
    """

    depth: int = 18
    stem_out_channels: int = 64
    res2_out_channels: int = 64
    num_groups: int = 1
    width_per_group: int = 64
    res5_dilation: int = 2
    norm: str = "FrozenBN"
    out_features: Sequence[str] = ("res5",)
    # MRRP
    mrrp_on: bool = False
    mrrp_num_branch: int = 3
    mrrp_dilations: Sequence[int] = (1, 2, 3)
    mrrp_stage: str = "res5"
    mrrp_test_branch_idx: int = 1
    # "int8": shift-decomposed int8 GEMM convs on res4/res5 (the MAC-heavy
    # stages; ~3/4 of R50 MACs incl. the 1x1s). Inference-scale numerics —
    # use only with the frozen backbone every shipped config has.
    conv_quant: str = "none"

    @property
    def num_blocks_per_stage(self) -> List[int]:
        return {
            18: [2, 2, 2, 2],
            34: [3, 4, 6, 3],
            50: [3, 4, 6, 3],
            101: [3, 4, 23, 3],
            152: [3, 8, 36, 3],
        }[self.depth]

    def output_channels(self) -> Dict[str, int]:
        out = {}
        c = self.res2_out_channels
        for i, name in enumerate(["res2", "res3", "res4", "res5"]):
            out[name] = c
            c *= 2
        return {k: v for k, v in out.items() if k in self.out_features}

    def output_strides(self) -> Dict[str, int]:
        stride = 4
        out = {}
        for idx, name in enumerate(["res2", "res3", "res4", "res5"]):
            stage_idx = idx + 2
            first_stride = 2 if idx == 0 or (stage_idx == 3 and self.res5_dilation == 1) else 1
            stride *= first_stride
            out[name] = stride
        return {k: v for k, v in out.items() if k in self.out_features}

    @nn.compact
    def __call__(self, x, train: bool = False):
        basic = self.depth in (18, 34)
        x = BasicStem(self.stem_out_channels, self.norm, name="stem")(x)

        outputs: Dict[str, jnp.ndarray] = {}
        out_channels = self.res2_out_channels
        bottleneck_channels = self.num_groups * self.width_per_group
        branches: Optional[List[jnp.ndarray]] = None  # per-branch tensors in MRRP stage

        for idx, stage_idx in enumerate(range(2, 6)):
            name = f"res{stage_idx}"
            dilation = self.res5_dilation if stage_idx in (4, 5) else 1
            first_stride = 2 if idx == 0 or (stage_idx == 3 and self.res5_dilation == 1) else 1
            has_pool = stage_idx in (2, 3)
            n_blocks = self.num_blocks_per_stage[idx]
            is_mrrp = self.mrrp_on and name == self.mrrp_stage

            for b in range(n_blocks):
                last = b == n_blocks - 1
                kwargs = dict(
                    out_channels=out_channels,
                    pool_stride=first_stride if last else 1,
                    has_pool=has_pool and last,
                    dilation=dilation,
                    norm=self.norm,
                    quant=self.conv_quant if stage_idx >= 4 else "none",
                )
                if basic:
                    block = BasicBlock(**kwargs, name=f"{name}_{b}")
                else:
                    block = BottleneckBlock(
                        bottleneck_channels=bottleneck_channels, num_groups=self.num_groups,
                        **kwargs, name=f"{name}_{b}",
                    )
                if is_mrrp:
                    if branches is None:
                        branches = [x] * self.mrrp_num_branch
                    if train or self.mrrp_test_branch_idx < 0:
                        branches = [
                            block(bt, dilation=dl)
                            for bt, dl in zip(branches, self.mrrp_dilations)
                        ]
                    else:
                        # test-time single-branch mode (MRRPConv test_branch_idx)
                        dl = self.mrrp_dilations[self.mrrp_test_branch_idx]
                        branches = [block(branches[0], dilation=dl)]
                else:
                    x = block(x)

            if is_mrrp:
                # concat branches along batch (reference resnet_wsl_mrrp.py:216-239)
                x = jnp.concatenate(branches, axis=0)
                branches = None
            if name in self.out_features:
                outputs[name] = x

            out_channels *= 2
            bottleneck_channels *= 2

        return outputs


def build_wsl_resnet_backbone(cfg) -> WSRResNet:
    """Config-driven builder (reference ``resnet_wsl.py:623-707``)."""
    if cfg.MODEL.RESNETS.DEPTH in (18, 34):
        assert cfg.MODEL.RESNETS.RES2_OUT_CHANNELS == 64, (
            "Set MODEL.RESNETS.RES2_OUT_CHANNELS = 64 for R18/R34 "
            f"(got {cfg.MODEL.RESNETS.RES2_OUT_CHANNELS})"
        )
    mrrp = cfg.MODEL.MRRP
    return WSRResNet(
        depth=cfg.MODEL.RESNETS.DEPTH,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        res5_dilation=cfg.MODEL.RESNETS.RES5_DILATION,
        norm=cfg.MODEL.RESNETS.NORM,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        mrrp_on=mrrp.MRRP_ON,
        mrrp_num_branch=mrrp.NUM_BRANCH,
        mrrp_dilations=tuple(mrrp.BRANCH_DILATIONS),
        mrrp_stage=mrrp.MRRP_STAGE,
        mrrp_test_branch_idx=mrrp.TEST_BRANCH_IDX,
        conv_quant=cfg.TPU.BACKBONE_CONV_QUANT,
    )
