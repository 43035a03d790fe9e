"""SAM checkpoint importer (official ``sam_vit_{b,l,h}_*.pth`` -> flax params)."""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w):  # torch linear -> flax dense
    return np.transpose(w, (1, 0))


def _conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _convT(w):
    """torch ConvTranspose2d [in, out, kh, kw] -> flax ConvTranspose with
    transpose_kernel=True, kernel shape (kh, kw, out, in) — verified exact vs
    torch in tests/test_sam.py."""
    return np.transpose(w, (2, 3, 1, 0))


def _ln(state, prefix):
    return {"scale": state[prefix + ".weight"], "bias": state[prefix + ".bias"]}


def _dense(state, prefix):
    return {"kernel": _t(state[prefix + ".weight"]), "bias": state[prefix + ".bias"]}


def import_sam_weights(state: Dict[str, np.ndarray]) -> Dict:
    """Official SAM state dict -> params for ``wsovod_tpu.offline.sam.SAM``."""
    p: Dict = {"image_encoder": {}, "prompt_encoder": {}, "mask_decoder": {}}

    ie = p["image_encoder"]
    ie["patch_embed"] = {
        "kernel": _conv(state["image_encoder.patch_embed.proj.weight"]),
        "bias": state["image_encoder.patch_embed.proj.bias"],
    }
    ie["pos_embed"] = state["image_encoder.pos_embed"]
    i = 0
    while f"image_encoder.blocks.{i}.norm1.weight" in state:
        b = f"image_encoder.blocks.{i}."
        blk = {
            "norm1": _ln(state, b + "norm1"),
            "norm2": _ln(state, b + "norm2"),
            "attn": {
                "qkv": _dense(state, b + "attn.qkv"),
                "proj": _dense(state, b + "attn.proj"),
            },
            "mlp_lin1": _dense(state, b + "mlp.lin1"),
            "mlp_lin2": _dense(state, b + "mlp.lin2"),
        }
        if b + "attn.rel_pos_h" in state:
            blk["attn"]["rel_pos_h"] = state[b + "attn.rel_pos_h"]
            blk["attn"]["rel_pos_w"] = state[b + "attn.rel_pos_w"]
        ie[f"block{i}"] = blk
        i += 1
    ie["neck_conv1"] = {"kernel": _conv(state["image_encoder.neck.0.weight"])}
    ie["neck_ln1"] = _ln(state, "image_encoder.neck.1")
    ie["neck_conv2"] = {"kernel": _conv(state["image_encoder.neck.2.weight"])}
    ie["neck_ln2"] = _ln(state, "image_encoder.neck.3")

    pe = p["prompt_encoder"]
    pe["pe_gaussian"] = state["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    pe["point_embeddings"] = np.concatenate(
        [state[f"prompt_encoder.point_embeddings.{k}.weight"] for k in range(4)], axis=0
    )
    pe["not_a_point"] = state["prompt_encoder.not_a_point_embed.weight"]
    pe["no_mask_embed"] = state["prompt_encoder.no_mask_embed.weight"]

    md = p["mask_decoder"]
    md["iou_token"] = state["mask_decoder.iou_token.weight"]
    md["mask_tokens"] = state["mask_decoder.mask_tokens.weight"]
    for i in range(2):
        t = f"mask_decoder.transformer.layers.{i}."

        def attn(prefix):
            return {
                "q_proj": _dense(state, prefix + ".q_proj"),
                "k_proj": _dense(state, prefix + ".k_proj"),
                "v_proj": _dense(state, prefix + ".v_proj"),
                "out_proj": _dense(state, prefix + ".out_proj"),
            }

        md[f"block{i}"] = {
            "self_attn": attn(t + "self_attn"),
            "cross_attn_t2i": attn(t + "cross_attn_token_to_image"),
            "cross_attn_i2t": attn(t + "cross_attn_image_to_token"),
            "norm1": _ln(state, t + "norm1"),
            "norm2": _ln(state, t + "norm2"),
            "norm3": _ln(state, t + "norm3"),
            "norm4": _ln(state, t + "norm4"),
            "mlp_lin1": _dense(state, t + "mlp.lin1"),
            "mlp_lin2": _dense(state, t + "mlp.lin2"),
        }
    md["final_attn"] = {
        "q_proj": _dense(state, "mask_decoder.transformer.final_attn_token_to_image.q_proj"),
        "k_proj": _dense(state, "mask_decoder.transformer.final_attn_token_to_image.k_proj"),
        "v_proj": _dense(state, "mask_decoder.transformer.final_attn_token_to_image.v_proj"),
        "out_proj": _dense(
            state, "mask_decoder.transformer.final_attn_token_to_image.out_proj"
        ),
    }
    md["final_norm"] = _ln(state, "mask_decoder.transformer.norm_final_attn")
    md["upscale1"] = {
        "kernel": _convT(state["mask_decoder.output_upscaling.0.weight"]),
        "bias": state["mask_decoder.output_upscaling.0.bias"],
    }
    md["upscale_ln"] = _ln(state, "mask_decoder.output_upscaling.1")
    md["upscale2"] = {
        "kernel": _convT(state["mask_decoder.output_upscaling.3.weight"]),
        "bias": state["mask_decoder.output_upscaling.3.bias"],
    }
    for m in range(4):
        for d in range(3):
            md[f"hyper{m}_lin{d}"] = _dense(
                state, f"mask_decoder.output_hypernetworks_mlps.{m}.layers.{d}"
            )
    for d in range(3):
        md[f"iou_lin{d}"] = _dense(state, f"mask_decoder.iou_prediction_head.layers.{d}")

    import jax
    import jax.numpy as jnp

    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}


def load_sam_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in state:
        state = state["model"]
    return {k: v.numpy() for k, v in state.items()}
