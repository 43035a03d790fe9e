"""Class heads: OpenVocabularyClassifier and DataAwareFeaturesHead.

Reference: ``wsovod/modeling/class_heads/open_vocabulary_classifier.py:14-105``
and ``wsovod/modeling/class_heads/data_aware_features_head.py:19-129``.

On TPU the open-vocabulary classification is a single fused GEMM chain:
project (input -> 1024 -> relu -> D -> relu), L2-normalize, scale by the
norm temperature, and matmul against the (normalized) CLIP text-embedding
matrix ``[D, C]`` with an optional appended zero background column.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # matches torch F.normalize: x / max(||x||, eps)
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


class OpenVocabularyClassifier(nn.Module):
    """Cosine-similarity region classifier against class text embeddings.

    ``embeddings`` (the default C x D class weight loaded from the pickled
    CLIP text matrix) is stored as a constant; passing ``classifier`` at call
    time overrides it (the open-vocabulary swap / per-dataset classifiers in
    mixed-dataset training, reference ``open_vocabulary_classifier.py:86-92``).
    """

    num_classes: int
    weight_dim: int = 512
    use_bias: float = 0.0
    norm_weight: bool = True
    norm_temperature: float = 50.0
    random_weight: bool = False  # weight_path == "rand" in the reference
    dtype: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [..., F]
        classifier: Optional[jnp.ndarray] = None,  # [C', D] runtime override
        append_background: bool = False,
        embeddings: Optional[jnp.ndarray] = None,  # [C, D] stored default
    ) -> jnp.ndarray:
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="proj1")(x))
        x = nn.relu(nn.Dense(self.weight_dim, dtype=self.dtype, name="proj2")(x))
        x = x.astype(jnp.float32)  # normalize + cosine logits in f32

        if classifier is not None:
            w = classifier.T  # [D, C']
            if self.norm_weight:
                w = l2_normalize(w, axis=0)
        elif self.random_weight:
            w = self.param(
                "class_weight",
                nn.initializers.normal(0.01),
                (self.weight_dim, self.num_classes),
            )
            if self.norm_weight:
                w = l2_normalize(w, axis=0)
        else:
            assert embeddings is not None, (
                "OpenVocabularyClassifier needs `embeddings` (C x D) or a "
                "runtime `classifier`"
            )
            w = embeddings.T
            if self.norm_weight:
                w = l2_normalize(w, axis=0)

        if self.norm_weight:
            x = self.norm_temperature * l2_normalize(x, axis=-1)

        if append_background:
            w = jnp.concatenate([w, jnp.zeros((w.shape[0], 1), w.dtype)], axis=1)

        out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        if abs(self.use_bias) > 1e-9:
            bias = self.param(
                "cls_bias", nn.initializers.constant(self.use_bias), (1,)
            )
            out = out + bias
        return out


class DataAwareFeaturesHead(nn.Module):
    """Input-conditional mixture over learned dataset-attribute prototypes.

    Per image: masked GAP over the backbone map (MRRP: mean over branches) ->
    FC(ch -> ch//16) ReLU -> FC(-> prototype_num) Tanh -> coefficients matmul
    the ``[prototype_num, features_dim]`` prototype embedding -> one vector,
    later added to every ROI feature. Reference
    ``data_aware_features_head.py:19-129``.
    """

    prototype_num: int = 5
    features_dim: int = 4096
    mrrp_on: bool = False
    mrrp_num_branch: int = 3

    @nn.compact
    def __call__(
        self,
        feature: jnp.ndarray,  # [B(*branches), H, W, C]
        pixel_valid: Optional[jnp.ndarray] = None,  # [B, H, W] bool (pre-branch B)
    ) -> jnp.ndarray:
        if self.mrrp_on:
            br = self.mrrp_num_branch
            if feature.shape[0] % br == 0 and feature.shape[0] >= br:
                b = feature.shape[0] // br
                feature = feature.reshape((br, b) + feature.shape[1:]).mean(axis=0)

        if pixel_valid is not None and pixel_valid.shape[0] == feature.shape[0]:
            m = pixel_valid[..., None].astype(feature.dtype)
            x = jnp.sum(feature * m, axis=(1, 2)) / jnp.maximum(
                jnp.sum(m, axis=(1, 2)), 1.0
            )
        else:
            x = feature.mean(axis=(1, 2))  # [B, C]

        c = x.shape[-1]
        init = nn.initializers.uniform(scale=0.02)  # ~U(-0.01, 0.01) equivalent span
        x = nn.relu(nn.Dense(c // 16, name="linear1", kernel_init=init)(x))
        x = nn.tanh(nn.Dense(self.prototype_num, name="linear2", kernel_init=init)(x))
        prototypes = self.param(
            "datasets_feat",
            nn.initializers.normal(1.0),
            (self.prototype_num, self.features_dim),
        )
        return jnp.dot(x, prototypes.astype(x.dtype))  # [B, features_dim]


def build_data_aware_head(cfg) -> DataAwareFeaturesHead:
    return DataAwareFeaturesHead(
        prototype_num=cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.PROTOTYPE_NUM,
        features_dim=cfg.MODEL.ROI_BOX_HEAD.DAN_DIM[-1],
        mrrp_on=cfg.MODEL.MRRP.MRRP_ON,
        mrrp_num_branch=cfg.MODEL.MRRP.NUM_BRANCH,
    )
