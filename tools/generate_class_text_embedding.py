#!/usr/bin/env python
"""CLIP class text-embedding export on TPU.

Replaces ``tools/generate_class_text_embedding{,_cuda}.py:16-126``: encodes
dataset class names with the JAX CLIP text tower (single prompt
"a photo of a {c}." or the multi-template ensemble averaged per class) and
pickles the C x D float32 matrix consumed by ``OpenVocabularyClassifier``.

Tokenization uses a local HuggingFace CLIP tokenizer (``--tokenizer`` points
at a directory with vocab.json/merges.txt); weights come from an OpenAI CLIP
checkpoint (.pt state dict) or HF CLIPTextModel state dict.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CLIP_TEXT_CONFIGS = {
    "ViT-B/32": dict(width=512, layers=12, heads=8, projection_dim=512),
    "ViT-B/16": dict(width=512, layers=12, heads=8, projection_dim=512),
    "ViT-L/14": dict(width=768, layers=12, heads=12, projection_dim=768),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="coco_2017_val")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", default="ViT-B/32", choices=list(CLIP_TEXT_CONFIGS))
    p.add_argument("--tokenizer", default="openai/clip-vit-base-patch32",
                   help="HF tokenizer name or local path")
    p.add_argument("--output", required=True)
    p.add_argument("--multi-prompt", action="store_true",
                   help="use the template ensemble instead of the single prompt")
    args = p.parse_args()

    import jax.numpy as jnp
    import torch
    from transformers import CLIPTokenizerFast

    from wsovod_tpu.data.catalog import MetadataCatalog
    from wsovod_tpu.data.datasets.builtin import register_all
    from wsovod_tpu.offline.clip_text import (
        CLIPTextEncoder,
        PROMPT_TEMPLATES,
        encode_class_names,
        import_hf_clip_text,
        import_openai_clip_text,
    )

    register_all()
    class_names = list(MetadataCatalog.get(args.dataset).thing_classes)
    print(f"{len(class_names)} classes from {args.dataset}")

    state = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in state.items()}

    cfg = CLIP_TEXT_CONFIGS[args.model]
    model = CLIPTextEncoder(
        width=cfg["width"], layers=cfg["layers"], heads=cfg["heads"],
        projection_dim=cfg["projection_dim"],
    )
    if any(k.startswith("text_model.") for k in state):
        params = import_hf_clip_text(state)
    else:
        params = import_openai_clip_text(state)

    tok = CLIPTokenizerFast.from_pretrained(args.tokenizer)

    def tokenize(prompts):
        out = tok(prompts, padding="max_length", max_length=77, truncation=True)
        return np.asarray(out["input_ids"], np.int32)

    emb = encode_class_names(
        model, params, tokenize, class_names,
        templates=PROMPT_TEMPLATES if args.multi_prompt else None,
    )
    with open(args.output, "wb") as f:
        pickle.dump(emb, f)
    print(f"wrote {emb.shape} embeddings to {args.output}")


if __name__ == "__main__":
    main()
