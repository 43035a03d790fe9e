"""Parity of the JAX CLIP text tower vs HuggingFace CLIPTextModel (random
weights — no network needed)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    cfg = CLIPTextConfig(
        vocab_size=100,
        hidden_size=32,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        projection_dim=24,
        hidden_act="quick_gelu",
        eos_token_id=99,
        bos_token_id=98,
    )
    torch.manual_seed(0)
    model = CLIPTextModelWithProjection(cfg).eval()
    return cfg, model


def test_clip_text_matches_hf(hf_pair):
    torch = pytest.importorskip("torch")
    cfg, hf = hf_pair
    from wsovod_tpu.offline.clip_text import CLIPTextEncoder, import_hf_clip_text

    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = CLIPTextEncoder(
        vocab_size=cfg.vocab_size,
        context_length=cfg.max_position_embeddings,
        width=cfg.hidden_size,
        layers=cfg.num_hidden_layers,
        heads=cfg.num_attention_heads,
        projection_dim=cfg.projection_dim,
    )
    params = import_hf_clip_text(state)

    rng = np.random.RandomState(0)
    # simulated tokens: BOS(98) ... EOT(99=max id) padding zeros
    tokens = np.zeros((3, 16), np.int64)
    for i in range(3):
        n = rng.randint(3, 10)
        tokens[i, 0] = 98
        tokens[i, 1 : 1 + n] = rng.randint(1, 98, n)
        tokens[i, 1 + n] = 99

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(tokens)).text_embeds.numpy()

    out = np.asarray(ours.apply(params, jnp.asarray(tokens.astype(np.int32))))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_encode_class_names_shape(hf_pair):
    cfg, hf = hf_pair
    from wsovod_tpu.offline.clip_text import (
        CLIPTextEncoder,
        encode_class_names,
        import_hf_clip_text,
    )

    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = CLIPTextEncoder(
        vocab_size=cfg.vocab_size,
        context_length=cfg.max_position_embeddings,
        width=cfg.hidden_size,
        layers=cfg.num_hidden_layers,
        heads=cfg.num_attention_heads,
        projection_dim=cfg.projection_dim,
    )
    params = import_hf_clip_text(state)

    def fake_tokenize(prompts):
        rng = np.random.RandomState(1)
        toks = np.zeros((len(prompts), 16), np.int32)
        toks[:, 0] = 98
        for i in range(len(prompts)):
            toks[i, 1:5] = rng.randint(1, 98, 4)
            toks[i, 5] = 99
        return toks

    emb = encode_class_names(
        ours, params, fake_tokenize, ["cat", "dog"], templates=["a {}", "the {}"]
    )
    assert emb.shape == (2, 24)
