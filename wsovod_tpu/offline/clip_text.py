"""CLIP text encoder (JAX) for class text-embedding export.

TPU-native replacement for the reference's offline pipeline
``tools/generate_class_text_embedding_cuda.py:16-126`` (openai/CLIP text
tower): token embedding + positional embedding -> L pre-LN transformer blocks
with causal attention and QuickGELU -> final LayerNorm -> take the EOT token
-> text projection. Embeddings for C class names (single prompt
"a photo of a {c}." or a multi-template ensemble averaged per class) are
pickled as a C x D float matrix consumed by ``OpenVocabularyClassifier``.

Weights import from an OpenAI CLIP checkpoint (torch ``state_dict`` with
``transformer.resblocks...`` keys) or a HuggingFace ``CLIPTextModel``
state dict (``text_model.encoder.layers...``). Tokenization uses the BPE
tokenizer from ``transformers`` (local files) — no network access needed at
runtime beyond the user-provided checkpoint.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Standard CLIP prompt-ensemble templates (OpenAI ImageNet prompt subset, as
# used by the reference's multi-prompt mode).
PROMPT_TEMPLATES = [
    "a photo of a {}.",
    "a bad photo of a {}.",
    "a photo of many {}.",
    "a sculpture of a {}.",
    "a photo of the hard to see {}.",
    "a low resolution photo of the {}.",
    "a rendering of a {}.",
    "graffiti of a {}.",
    "a bad photo of the {}.",
    "a cropped photo of the {}.",
    "a tattoo of a {}.",
    "the embroidered {}.",
    "a photo of a hard to see {}.",
    "a bright photo of a {}.",
    "a photo of a clean {}.",
    "a photo of a dirty {}.",
    "a dark photo of the {}.",
    "a drawing of a {}.",
    "a photo of my {}.",
    "the plastic {}.",
    "a photo of the cool {}.",
    "a close-up photo of a {}.",
    "a black and white photo of the {}.",
    "a painting of the {}.",
    "a painting of a {}.",
    "a pixelated photo of the {}.",
    "a sculpture of the {}.",
    "a bright photo of the {}.",
    "a cropped photo of a {}.",
    "a plastic {}.",
    "a photo of the dirty {}.",
    "a jpeg corrupted photo of a {}.",
    "a blurry photo of the {}.",
    "a photo of the {}.",
    "a good photo of the {}.",
    "a rendering of the {}.",
    "a {} in a video game.",
    "a photo of one {}.",
    "a doodle of a {}.",
    "a close-up photo of the {}.",
    "the origami {}.",
    "the {} in a video game.",
    "a sketch of a {}.",
    "a doodle of the {}.",
    "a origami {}.",
    "a low resolution photo of a {}.",
    "the toy {}.",
    "a rendition of the {}.",
    "a photo of the clean {}.",
    "a photo of a large {}.",
    "a rendition of a {}.",
    "a photo of a nice {}.",
    "a photo of a weird {}.",
]


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class TextBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, causal_mask):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        b, l, c = h.shape
        qkv = nn.Dense(3 * c, name="attn_in")(h).reshape(b, l, 3, self.heads, c // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (c // self.heads) ** -0.5
        attn = jnp.einsum("blhd,bmhd->bhlm", q * scale, k) + causal_mask
        attn = nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhlm,bmhd->blhd", attn, v).reshape(b, l, c)
        x = x + nn.Dense(c, name="attn_out")(o)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * c, name="mlp_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(c, name="mlp_proj")(h)
        return x


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    projection_dim: int = 512

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, eot_positions: Optional[jnp.ndarray] = None):
        """tokens [B, L] int32 -> [B, projection_dim] text features."""
        b, l = tokens.shape
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = jnp.take(jnp.asarray(tok_emb), tokens, axis=0) + jnp.asarray(pos_emb)[None, :l]
        mask = jnp.triu(jnp.full((l, l), -jnp.inf), k=1)[None, None]
        for i in range(self.layers):
            x = TextBlock(self.width, self.heads, name=f"block{i}")(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        if eot_positions is None:
            eot_positions = jnp.argmax(tokens, axis=-1)  # EOT has the max id
        feats = x[jnp.arange(b), eot_positions]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.projection_dim),
        )
        return feats @ proj


def import_openai_clip_text(state: Dict[str, np.ndarray]) -> Dict:
    """OpenAI CLIP checkpoint (``transformer.resblocks.N...``) -> params."""
    p: Dict = {
        "token_embedding": state["token_embedding.weight"],
        "positional_embedding": state["positional_embedding"],
        "text_projection": state["text_projection"],
        "ln_final": {
            "scale": state["ln_final.weight"],
            "bias": state["ln_final.bias"],
        },
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in state:
        pre = f"transformer.resblocks.{i}."
        p[f"block{i}"] = {
            "ln_1": {"scale": state[pre + "ln_1.weight"], "bias": state[pre + "ln_1.bias"]},
            "ln_2": {"scale": state[pre + "ln_2.weight"], "bias": state[pre + "ln_2.bias"]},
            "attn_in": {
                "kernel": state[pre + "attn.in_proj_weight"].T,
                "bias": state[pre + "attn.in_proj_bias"],
            },
            "attn_out": {
                "kernel": state[pre + "attn.out_proj.weight"].T,
                "bias": state[pre + "attn.out_proj.bias"],
            },
            "mlp_fc": {
                "kernel": state[pre + "mlp.c_fc.weight"].T,
                "bias": state[pre + "mlp.c_fc.bias"],
            },
            "mlp_proj": {
                "kernel": state[pre + "mlp.c_proj.weight"].T,
                "bias": state[pre + "mlp.c_proj.bias"],
            },
        }
        i += 1
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}


def import_hf_clip_text(state: Dict[str, np.ndarray]) -> Dict:
    """HuggingFace CLIPTextModel state dict -> params."""
    pre = "text_model."
    p: Dict = {
        "token_embedding": state[pre + "embeddings.token_embedding.weight"],
        "positional_embedding": state[pre + "embeddings.position_embedding.weight"],
        "ln_final": {
            "scale": state[pre + "final_layer_norm.weight"],
            "bias": state[pre + "final_layer_norm.bias"],
        },
    }
    if "text_projection.weight" in state:
        p["text_projection"] = state["text_projection.weight"].T
    else:
        width = p["token_embedding"].shape[1]
        p["text_projection"] = np.eye(width, dtype=np.float32)
    i = 0
    while pre + f"encoder.layers.{i}.layer_norm1.weight" in state:
        lp = pre + f"encoder.layers.{i}."
        q_w = state[lp + "self_attn.q_proj.weight"]
        k_w = state[lp + "self_attn.k_proj.weight"]
        v_w = state[lp + "self_attn.v_proj.weight"]
        q_b = state[lp + "self_attn.q_proj.bias"]
        k_b = state[lp + "self_attn.k_proj.bias"]
        v_b = state[lp + "self_attn.v_proj.bias"]
        p[f"block{i}"] = {
            "ln_1": {
                "scale": state[lp + "layer_norm1.weight"],
                "bias": state[lp + "layer_norm1.bias"],
            },
            "ln_2": {
                "scale": state[lp + "layer_norm2.weight"],
                "bias": state[lp + "layer_norm2.bias"],
            },
            "attn_in": {
                "kernel": np.concatenate([q_w, k_w, v_w], axis=0).T,
                "bias": np.concatenate([q_b, k_b, v_b], axis=0),
            },
            "attn_out": {
                "kernel": state[lp + "self_attn.out_proj.weight"].T,
                "bias": state[lp + "self_attn.out_proj.bias"],
            },
            "mlp_fc": {
                "kernel": state[lp + "mlp.fc1.weight"].T,
                "bias": state[lp + "mlp.fc1.bias"],
            },
            "mlp_proj": {
                "kernel": state[lp + "mlp.fc2.weight"].T,
                "bias": state[lp + "mlp.fc2.bias"],
            },
        }
        i += 1
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}


def encode_class_names(
    model: CLIPTextEncoder,
    params,
    tokenize,  # callable: list[str] -> int32 [N, 77]
    class_names: Sequence[str],
    templates: Optional[Sequence[str]] = None,
    batch_size: int = 256,
) -> np.ndarray:
    """C x D embedding matrix; multi-template ensembles are averaged per class
    (reference ``generate_class_text_embedding_cuda.py:91-121``)."""
    templates = list(templates) if templates else ["a photo of a {}."]
    prompts = [t.format(c) for c in class_names for t in templates]
    tokens = tokenize(prompts)
    feats = []
    apply = jax.jit(lambda tk: model.apply(params, tk))
    for i in range(0, len(prompts), batch_size):
        feats.append(np.asarray(apply(jnp.asarray(tokens[i : i + batch_size]))))
    feats = np.concatenate(feats)
    feats = feats.reshape(len(class_names), len(templates), -1).mean(axis=1)
    return feats.astype(np.float32)
