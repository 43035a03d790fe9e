"""Import reference checkpoints into the flax param pytree.

Two sources matter for parity (SURVEY.md §7.3: FREEZE_AT=5 means the
backbone is frozen in every shipped config, so import fidelity is
accuracy-critical):

* DRN-WSOD pretrained backbone pickles (d2 format: a dict with ``model`` ->
  flat ``name -> np.ndarray`` in Caffe2/torch conventions, e.g.
  ``models/DRN-WSOD/resnet18_ws_model_120_d2.pkl``);
* torch checkpoints of full WSOVOD models (``state_dict`` style).

Layout conversions:
* conv kernels: torch OIHW -> flax HWIO (transpose 2,3,1,0);
* linear: torch [out, in] -> flax [in, out] (transpose);
* the first FC after a pooled NCHW feature map additionally permutes its
  input dim from (C, H, W) flat order to our NHWC (H, W, C) flat order;
* BN: weight/bias/running_mean/running_var -> FrozenBatchNorm
  scale/bias/mean/var.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def load_checkpoint_file(path: str) -> Dict[str, np.ndarray]:
    """Load a d2 pickle or torch checkpoint into flat name -> ndarray."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        blobs = data.get("model", data)
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        blobs = data.get("model", data.get("state_dict", data))
        blobs = {
            k: v.numpy() if hasattr(v, "numpy") else v for k, v in blobs.items()
        }
    return {k: np.asarray(v) for k, v in blobs.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _fc(w: np.ndarray, chw: Optional[Tuple[int, int, int]] = None) -> np.ndarray:
    """torch [out, in] -> flax [in, out]; optionally re-order a flattened
    (C, H, W) input dim to (H, W, C)."""
    if chw is not None:
        c, h, w_ = chw
        out = w.shape[0]
        w = w.reshape(out, c, h, w_).transpose(0, 2, 3, 1).reshape(out, c * h * w_)
    return np.transpose(w, (1, 0))


def _bn(blobs: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    def pick(*names):
        for n in names:
            if prefix + n in blobs:
                return blobs[prefix + n]
        raise KeyError(f"missing BN blob for {prefix} ({names})")

    return {
        "scale": pick("weight", "gamma"),
        "bias": pick("bias", "beta"),
        "mean": pick("running_mean", "running_mean_"),
        "var": pick("running_var", "running_var_"),
    }


def _convnorm(blobs, torch_prefix: str, has_norm: bool = True) -> Dict[str, Any]:
    out: Dict[str, Any] = {"kernel": _conv(blobs[torch_prefix + ".weight"])}
    if torch_prefix + ".bias" in blobs and not has_norm:
        out["bias"] = blobs[torch_prefix + ".bias"]
    if has_norm:
        out["FrozenBatchNorm_0"] = _bn(blobs, torch_prefix + ".norm.")
    return out


def import_wsr_resnet(
    blobs: Mapping[str, np.ndarray],
    depth: int = 18,
    prefix: str = "",
) -> Dict[str, Any]:
    """Map a DRN-WSOD / WSOVOD backbone state dict onto ``WSRResNet`` params.

    Torch names (d2 ResNet module layout): ``stem.conv{1,2,3}``,
    ``res{S}.{i}.conv{1..3}``, ``res{S}.{i}.shortcut``; each conv has a
    ``.norm`` FrozenBN.
    """
    p: Dict[str, Any] = {}
    stem = {}
    for i in (1, 2, 3):
        stem[f"conv{i}"] = {"ConvNorm_0": _convnorm(blobs, f"{prefix}stem.conv{i}")}
    # our BasicStem names convs conv1..conv3 directly as ConvNorm modules
    p["stem"] = {f"conv{i}": _convnorm(blobs, f"{prefix}stem.conv{i}") for i in (1, 2, 3)}

    blocks_per = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}[depth]
    basic = depth in (18, 34)
    for si, stage in enumerate(range(2, 6)):
        for b in range(blocks_per[si]):
            tp = f"{prefix}res{stage}.{b}."
            ours: Dict[str, Any] = {}
            n_convs = 2 if basic else 3
            for ci in range(1, n_convs + 1):
                ours[f"conv{ci}"] = _convnorm(blobs, tp + f"conv{ci}")
            if tp + "shortcut.weight" in blobs:
                ours["shortcut"] = _convnorm(blobs, tp + "shortcut")
            p[f"res{stage}_{b}"] = ours
    return p


def import_vgg16(blobs: Mapping[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    """Map a VGG16 backbone state dict onto ``VGG16`` params (convs carry
    bias, no norm)."""
    plan = [("plain1", 2), ("plain2", 2), ("plain3", 3), ("plain4", 3), ("plain5", 3)]
    p: Dict[str, Any] = {}
    for name, n_convs in plan:
        block = {}
        for ci in range(1, n_convs + 1):
            tp = f"{prefix}{name}.conv{ci}"
            block[f"conv{ci}"] = {
                "kernel": _conv(blobs[tp + ".weight"]),
                "bias": blobs[tp + ".bias"],
            }
        p[name] = block
    return p


def import_wsovod_model(
    blobs: Mapping[str, np.ndarray],
    params: Dict[str, Any],
    depth: int = 18,
    pooled_shape: Tuple[int, int, int] = (512, 7, 7),
) -> Dict[str, Any]:
    """Import a full reference WSOVOD checkpoint onto our model params.

    ``params`` is a template (from ``model.init``) whose structure we fill.
    Returns a new pytree. Heads covered: DAN fc1/fc2 (with NCHW->NHWC input
    permute on fc1), object miner cls/det, refinery OV projections +
    bbox_pred, data-aware head.
    """
    import copy

    out = copy.deepcopy(
        {k: v for k, v in params.items()}
    )
    model = out["params"] if "params" in out else out

    has = lambda k: k in blobs
    backbone_key = "backbone"
    if any(k.startswith("backbone.") for k in blobs):
        model[backbone_key] = import_wsr_resnet(blobs, depth=depth, prefix="backbone.")

    # DAN box head: torch roi_heads.box_head.fc{1,2}. fc1 is a DenseGeneral
    # contracting (h, w, c): torch [out, c*h*w] -> kernel (h, w, c, out).
    bh = "roi_heads.box_head."
    if has(bh + "fc1.weight"):
        dan = model["roi_heads"]["box_head"]
        c, hh, ww = pooled_shape
        w1 = blobs[bh + "fc1.weight"]  # [out, c*h*w]
        out_dim = w1.shape[0]
        dan["fc1"]["kernel"] = (
            w1.reshape(out_dim, c, hh, ww).transpose(2, 3, 1, 0)
        )
        dan["fc1"]["bias"] = blobs[bh + "fc1.bias"]
        dan["fc2"]["kernel"] = _fc(blobs[bh + "fc2.weight"])
        dan["fc2"]["bias"] = blobs[bh + "fc2.bias"]

    om = "roi_heads.object_miner."
    if has(om + "cls.weight"):
        miner = model["roi_heads"]["object_miner"]
        miner["cls"]["kernel"] = _fc(blobs[om + "cls.weight"])
        miner["cls"]["bias"] = blobs[om + "cls.bias"]
        miner["det"]["kernel"] = _fc(blobs[om + "det.weight"])
        miner["det"]["bias"] = blobs[om + "det.bias"]

    k = 0
    while has(f"roi_heads.box_refinery.{k}.cls.projection.0.weight"):
        rp = f"roi_heads.box_refinery.{k}."
        ref = model["roi_heads"][f"box_refinery_{k}"]
        ref["cls"]["proj1"]["kernel"] = _fc(blobs[rp + "cls.projection.0.weight"])
        ref["cls"]["proj1"]["bias"] = blobs[rp + "cls.projection.0.bias"]
        ref["cls"]["proj2"]["kernel"] = _fc(blobs[rp + "cls.projection.2.weight"])
        ref["cls"]["proj2"]["bias"] = blobs[rp + "cls.projection.2.bias"]
        if has(rp + "bbox_pred.weight"):
            ref["bbox_pred"]["kernel"] = _fc(blobs[rp + "bbox_pred.weight"])
            ref["bbox_pred"]["bias"] = blobs[rp + "bbox_pred.bias"]
        k += 1

    da = "data_aware_head."
    alt = "roi_heads.data_aware_head."
    for pref in (da, alt):
        if has(pref + "linear1.weight"):
            dah = model["data_aware_head"]
            dah["linear1"]["kernel"] = _fc(blobs[pref + "linear1.weight"])
            dah["linear1"]["bias"] = blobs[pref + "linear1.bias"]
            dah["linear2"]["kernel"] = _fc(blobs[pref + "linear2.weight"])
            dah["linear2"]["bias"] = blobs[pref + "linear2.bias"]
            dah["datasets_feat"] = blobs[pref + "datasets_feat.weight"]

    # RPN head. Shipped configs use d2's StandardRPNHead
    # (conv/objectness_logits/anchor_deltas, cfg default HEAD_NAME); the
    # registered-but-unused WSOVODRPNHead names its convs
    # rpn_conv/rpn_cls/rpn_reg/rpn_obj (reference rpn.py:43-50).
    rh = "proposal_generator.rpn_head."
    head_names = None
    if has(rh + "conv.weight"):
        head_names = ("conv", "objectness_logits", "anchor_deltas")
    elif has(rh + "rpn_conv.weight"):
        head_names = ("rpn_conv", "rpn_cls", "rpn_reg", "rpn_obj")
    if head_names:
        rpn = model["proposal_generator"]["rpn_head"]
        for nm in head_names:
            if nm in rpn and has(rh + nm + ".weight"):
                rpn[nm]["kernel"] = _conv(blobs[rh + nm + ".weight"])
                rpn[nm]["bias"] = blobs[rh + nm + ".bias"]

    return out


def jnp_tree(tree):
    import jax.numpy as jnp

    import jax

    return jax.tree_util.tree_map(jnp.asarray, tree)
