"""In-training SAM pseudo-GT box refinement (WSOVOD.BBOX_REFINE).

Reference ``wsovod/modeling/roi_heads/roi_heads.py:1215-1284`` +
``wsovod/utils/sam_predictor_with_buffer.py``: mined pseudo-GT boxes are
expanded 1.1x, box-prompt SAM, and each box is replaced by the bounding box
of the predicted mask (falling back to the original box when the mask is
empty/non-finite).

TPU-native layout: the SAM image ENCODER (the expensive ViT) runs once per
batch as its own jitted function in the trainer — on the augmented network
input resized to the SAM resolution — and its embeddings enter the train
step as a batch input (``sam_embed [B, G', G', 256]`` + per-image
``sam_scale``). The prompt encoder + mask decoder + mask->box reduction are
cheap and run INSIDE the train step as a frozen flax submodule, so the whole
step stays one compiled program. (The reference re-encodes the original image
with a per-step cache; encoding the augmented view keeps prompts and pixels
in the same coordinate frame with no inverse-augmentation plumbing.)
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..offline.sam.modeling import MaskDecoder, PromptEncoder


class SAMRefiner(nn.Module):
    """Box-prompted mask decode + mask->box, per image."""

    sam_img_size: int = 1024
    expand: float = 1.1
    mask_threshold: float = 0.0

    def setup(self):
        grid = self.sam_img_size // 16
        self.prompt_encoder = PromptEncoder(
            image_embedding_size=(grid, grid),
            input_image_size=(self.sam_img_size, self.sam_img_size),
        )
        self.mask_decoder = MaskDecoder()

    def __call__(
        self,
        sam_embed: jnp.ndarray,  # [Gh, Gw, 256] one image's embedding
        boxes: jnp.ndarray,  # [G, 4] network-input coords
        valid: jnp.ndarray,  # [G]
        sam_scale: jnp.ndarray,  # scalar: network coords -> SAM coords
    ) -> jnp.ndarray:
        """Returns refined boxes [G, 4] in network-input coords."""
        c = (boxes[:, :2] + boxes[:, 2:]) / 2.0
        half = (boxes[:, 2:] - boxes[:, :2]) / 2.0 * self.expand
        eb = jnp.concatenate([c - half, c + half], axis=1) * sam_scale
        eb = jnp.clip(eb, 0.0, float(self.sam_img_size))

        # single-pass bf16 MXU for the decoder's f32 matmuls: masks only seed
        # pseudo-GT boxes (thresholded at 0), so full f32 passes are wasted
        # here; no-op on CPU
        with jax.default_matmul_precision("bfloat16"):
            sparse, dense = self.prompt_encoder(boxes=eb)
            pe = self.prompt_encoder.dense_pe()
            masks, iou = self.mask_decoder(sam_embed[None], pe, sparse, dense)
        # single-mask output channel (SamPredictor multimask_output=False)
        m = masks[:, 0] > self.mask_threshold  # [G, 4Gh, 4Gw]

        mh = m.shape[1]
        up = self.sam_img_size / mh  # mask grid -> SAM coords

        any_row = jnp.any(m, axis=2)
        any_col = jnp.any(m, axis=1)
        rows = jnp.arange(m.shape[1], dtype=jnp.float32)
        cols = jnp.arange(m.shape[2], dtype=jnp.float32)
        y1 = jnp.min(jnp.where(any_row, rows[None], float(mh)), axis=1)
        y2 = jnp.max(jnp.where(any_row, rows[None], -1.0), axis=1)
        x1 = jnp.min(jnp.where(any_col, cols[None], float(m.shape[2])), axis=1)
        x2 = jnp.max(jnp.where(any_col, cols[None], -1.0), axis=1)
        refined = jnp.stack([x1, y1, x2 + 1.0, y2 + 1.0], axis=1) * up / sam_scale

        ok = (
            jnp.any(m, axis=(1, 2))
            & valid
            & jnp.all(jnp.isfinite(refined), axis=1)
        )
        return jnp.where(ok[:, None], refined, boxes)


def sam_input_from_batch(
    images: jnp.ndarray,  # [B, H, W, 3] raw BGR (network input, padded)
    sam_img_size: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resize the padded batch to SAM's square input; returns (x, scale).

    scale maps network-input pixel coords -> SAM-input coords (per batch, the
    padded H/W are static so the scale is a static scalar broadcast)."""
    from ..offline.sam.modeling import SAM_PIXEL_MEAN, SAM_PIXEL_STD

    b, h, w, _ = images.shape
    scale = sam_img_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = jax.image.resize(images, (b, nh, nw, 3), "linear")
    x = x[:, :, :, ::-1]  # BGR -> RGB
    x = (x - jnp.asarray(SAM_PIXEL_MEAN)) / jnp.asarray(SAM_PIXEL_STD)
    x = jnp.pad(x, ((0, 0), (0, sam_img_size - nh), (0, sam_img_size - nw), (0, 0)))
    return x, jnp.full((b,), scale, jnp.float32)
