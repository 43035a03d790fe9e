"""Segment Anything Model (SAM) in JAX/flax — image encoder, prompt encoder,
mask decoder.

TPU-native replacement for the ``segment-anything`` dependency used by the
reference's offline proposal pipeline (``tools/generate_sam_proposals_cuda.py``)
and the in-training box refinement (``wsovod/utils/sam_predictor_with_buffer.py``).

Architecture (SAM, Kirillov et al. 2023):
* image encoder: ViT-B/L/H, patch 16, 1024x1024 input -> 64x64 tokens;
  most blocks use 14x14 window attention, a few are global; decomposed
  relative position embeddings; neck = two convs -> 256 channels.
* prompt encoder: random-Fourier positional encoding of points/boxes.
* mask decoder: two-way transformer (token->image and image->token cross
  attention), 4 mask tokens + IoU token, 4x upscaling, per-mask IoU scores.

Weights import from the official ``sam_vit_{b,l,h}_*.pth`` checkpoints via
``import_sam_weights``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Image encoder (ViT-Det style with windows + decomposed rel pos)
# --------------------------------------------------------------------------


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Interpolate/select relative position embeddings (SAM semantics)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel = jax.image.resize(
            rel_pos.astype(jnp.float32), (max_rel_dist, rel_pos.shape[1]), "linear"
        )
    else:
        rel = rel_pos
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel_coords = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel[rel_coords.astype(jnp.int32)]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_hw, k_hw):
    """attn [B, qh*qw, kh*kw] += decomposed h/w relative positions.

    The rel einsums are arranged to batch over ONE spatial axis so each
    lowers to well-shaped [b*other_axis, dim] @ [dim, k] matmuls instead of
    b*axis tiny [axis, dim] @ [dim, k] ones (the naive form cost ~30 ms per
    SAM global layer on v5e)."""
    qh, qw = q_hw
    kh, kw = k_hw
    rh = _get_rel_pos(qh, kh, rel_pos_h)  # [qh, kh, dim]
    rw = _get_rel_pos(qw, kw, rel_pos_w)
    b, _, dim = q.shape
    r_q = q.reshape(b, qh, qw, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)  # [b, qh, qw, kh]
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)  # [b, qh, qw, kw]
    # materialize the bias and add it to attn in FLAT [b, q, k] form: the
    # broadcast-add on the 5-D reshaped view defeats XLA fusion and cost
    # ~40 ms/SAM-global-layer vs ~27 for this shape (v5e)
    bias = (rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]).reshape(
        b, qh * qw, kh * kw
    )
    return attn + bias


class ViTAttention(nn.Module):
    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    # >0: blockwise attention over query row-blocks — bounds the score
    # tensor to ~[B*heads, rows*w, h*w] for memory-constrained batches.
    # Default OFF: on v5e the blocked einsum lowering measured SLOWER than
    # the direct [B*heads, 4096, 4096] path (33 vs 10 ms without rel-pos);
    # the global-layer cost was the rel-pos einsum lowering instead (see
    # add_decomposed_rel_pos).
    q_chunk_rows: int = 0

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = nn.Dense(3 * c, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        qkv = qkv.reshape(3, b * nh, h * w, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = hd ** -0.5
        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, hd)
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, hd)
            )

        chunked = (
            self.q_chunk_rows > 0
            and h * w >= 4096
            and h % self.q_chunk_rows == 0
        )
        if chunked:
            r = self.q_chunk_rows
            nblk = h // r
            # everything stays 5-D inside the block (no reshapes between the
            # score einsum, the rel-pos adds, and the softmax) so XLA fuses
            # the bias+softmax into single passes over the score block
            q5 = q.reshape(b * nh, nblk, r, w, hd).transpose(1, 0, 2, 3, 4)
            k4 = k.reshape(b * nh, h, w, hd)
            v4 = v.reshape(b * nh, h, w, hd)
            if self.use_rel_pos:
                rh = _get_rel_pos(h, h, rel_h)  # [h, kh, hd]
                rw = _get_rel_pos(w, w, rel_w)  # [w, kw, hd]
                rh_b = rh.reshape(nblk, r, h, hd)

            def blk(args):
                qb, rhb = args  # [B*nh, r, w, hd], [r, h, hd]
                attn = jnp.einsum(
                    "brwd,bkld->brwkl", qb * scale, k4,
                    preferred_element_type=jnp.float32,
                )  # [B*nh, r, w, kh, kw]
                if self.use_rel_pos:
                    relh = jnp.einsum("brwd,rkd->brwk", qb, rhb)
                    relw = jnp.einsum("brwd,wkd->brwk", qb, rw)
                    attn = attn + (
                        relh[..., :, None] + relw[..., None, :]
                    ).astype(attn.dtype)
                m = jnp.max(attn, axis=(3, 4), keepdims=True)
                e = jnp.exp(attn - m).astype(qb.dtype)
                out = jnp.einsum("brwkl,bkld->brwd", e, v4)
                denom = jnp.sum(e.astype(jnp.float32), axis=(3, 4))[..., None]
                return out / denom.astype(out.dtype)

            rh_arg = rh_b if self.use_rel_pos else jnp.zeros((nblk, 1, 1, 1), q.dtype)
            out = jax.lax.map(blk, (q5, rh_arg))  # [nblk, B*nh, r, w, hd]
            x = out.transpose(1, 0, 2, 3, 4).reshape(b, nh, h * w, hd)
        else:
            attn = (q * scale) @ k.transpose(0, 2, 1)
            if self.use_rel_pos:
                attn = add_decomposed_rel_pos(attn, q, rel_h, rel_w, (h, w), (h, w))
            attn = nn.softmax(attn, axis=-1)
            x = (attn @ v).reshape(b, nh, h * w, hd)
        x = x.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(c, name="proj")(x)


def window_partition(x, ws):
    b, h, w, c = x.shape
    pad_h = (-h) % ws
    pad_w = (-w) % ws
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def window_unpartition(win, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.reshape(b, hp // ws, wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, -1)[:, :h, :w]


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 14
    global_input_size: Tuple[int, int] = (64, 64)
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.global_input_size
        x = ViTAttention(
            self.dim, self.num_heads, input_size=attn_size, name="attn"
        )(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_lin2")(y)
        return x + y


class SAMImageEncoder(nn.Module):
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768  # vit_b
    depth: int = 12
    num_heads: int = 12
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    out_chans: int = 256

    @nn.compact
    def __call__(self, x):
        """x [B, H, W, 3] normalized -> [B, H/16, W/16, 256]."""
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), name="patch_embed",
        )(x)
        grid = self.img_size // self.patch_size
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, grid, grid, self.embed_dim)
        )
        if x.shape[1] != grid or x.shape[2] != grid:
            pos_r = jax.image.resize(
                pos, (1, x.shape[1], x.shape[2], self.embed_dim), "linear"
            )
        else:
            pos_r = pos
        x = x + pos_r
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = ViTBlock(
                self.embed_dim,
                self.num_heads,
                window_size=ws,
                global_input_size=(x.shape[1], x.shape[2]),
                name=f"block{i}",
            )(x)
        # neck: 1x1 conv + LN2d + 3x3 conv + LN2d (channel-wise LN)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln1", use_fast_variance=False)(x)
        x = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False, name="neck_conv2")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln2", use_fast_variance=False)(x)
        return x


# --------------------------------------------------------------------------
# Prompt encoder
# --------------------------------------------------------------------------


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, self.embed_dim // 2)
        )
        # 0: neg point, 1: pos point, 2: box corner 1, 3: box corner 2
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.not_a_point = self.param(
            "not_a_point", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )

    def _pe_encode(self, coords01: jnp.ndarray) -> jnp.ndarray:
        """[..., 2] in [0,1] -> [..., embed_dim] random Fourier features."""
        coords = 2.0 * coords01 - 1.0
        coords = coords @ self.pe_gaussian
        coords = 2 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def encode_points(self, points: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """points [B, N, 2] pixel coords; labels [B, N] (1 pos, 0 neg, -1 pad)."""
        h, w = self.input_image_size
        coords = (points + 0.5) / jnp.asarray([w, h], points.dtype)
        pe = self._pe_encode(coords)
        pe = jnp.where(labels[..., None] == -1, self.not_a_point[0], pe)
        pe = pe + jnp.where(
            labels[..., None] == 1,
            self.point_embeddings[1],
            jnp.where(labels[..., None] == 0, self.point_embeddings[0], 0.0),
        )
        return pe

    def encode_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """boxes [B, 4] XYXY pixels -> [B, 2, embed_dim]."""
        h, w = self.input_image_size
        corners = (boxes.reshape(-1, 2, 2) + 0.5) / jnp.asarray([w, h], boxes.dtype)
        pe = self._pe_encode(corners)
        pe = pe.at[:, 0].add(self.point_embeddings[2])
        pe = pe.at[:, 1].add(self.point_embeddings[3])
        return pe

    def dense_pe(self) -> jnp.ndarray:
        """Positional encoding of the image embedding grid [H, W, C]."""
        h, w = self.image_embedding_size
        gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)  # [h, w, 2]
        return self._pe_encode(grid)

    def __call__(self, points=None, labels=None, boxes=None):
        parts = []
        if points is not None:
            parts.append(self.encode_points(points, labels))
        if boxes is not None:
            parts.append(self.encode_boxes(boxes))
        sparse = (
            jnp.concatenate(parts, axis=1)
            if parts
            else jnp.zeros((1, 0, self.embed_dim))
        )
        h, w = self.image_embedding_size
        dense = jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1),
            (sparse.shape[0], h, w, self.embed_dim),
        )
        return sparse, dense


# --------------------------------------------------------------------------
# Mask decoder (two-way transformer)
# --------------------------------------------------------------------------


class DecoderAttention(nn.Module):
    embed_dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embed_dim // self.downsample_rate
        nh = self.num_heads
        qq = nn.Dense(internal, name="q_proj")(q)
        kk = nn.Dense(internal, name="k_proj")(k)
        vv = nn.Dense(internal, name="v_proj")(v)

        def split(x):
            b, n, c = x.shape
            return x.reshape(b, n, nh, c // nh).transpose(0, 2, 1, 3)

        qq, kk, vv = split(qq), split(kk), split(vv)
        scale = (internal // nh) ** -0.5
        attn = nn.softmax((qq * scale) @ kk.transpose(0, 1, 3, 2), axis=-1)
        out = attn @ vv
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = DecoderAttention(self.embed_dim, self.num_heads, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(
                self.embed_dim, self.num_heads, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(
            self.embed_dim, self.num_heads, 2, name="cross_attn_t2i"
        )(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)

        mlp = nn.Dense(self.mlp_dim, name="mlp_lin1")(queries)
        mlp = nn.relu(mlp)
        queries = queries + nn.Dense(self.embed_dim, name="mlp_lin2")(mlp)
        queries = nn.LayerNorm(name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(
            self.embed_dim, self.num_heads, 2, name="cross_attn_i2t"
        )(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class MaskDecoder(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    depth: int = 2
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden: int = 256

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse_prompt, dense_prompt):
        """image_embed [1, H, W, C]; sparse_prompt [B, N, C];
        dense_prompt [B, H, W, C] -> (masks [B, M, 4H, 4W], iou [B, M])."""
        num_masks = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, self.embed_dim))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (num_masks, self.embed_dim)
        )
        b = sparse_prompt.shape[0]
        tokens = jnp.concatenate(
            [
                jnp.broadcast_to(iou_token[None], (b, 1, self.embed_dim)),
                jnp.broadcast_to(mask_tokens[None], (b, num_masks, self.embed_dim)),
                sparse_prompt,
            ],
            axis=1,
        )
        h, w, c = image_embed.shape[1:]
        src = jnp.broadcast_to(image_embed, (b, h, w, c)) + dense_prompt
        src = src.reshape(b, h * w, c)
        pos = jnp.broadcast_to(image_pe.reshape(1, h * w, c), (b, h * w, c))

        queries, keys = tokens, src
        for i in range(self.depth):
            queries, keys = TwoWayBlock(
                self.embed_dim, self.num_heads, skip_first_layer_pe=(i == 0),
                name=f"block{i}",
            )(queries, keys, tokens, pos)
        q = queries + tokens
        k = keys + pos
        queries = queries + DecoderAttention(
            self.embed_dim, self.num_heads, 2, name="final_attn"
        )(q, k, keys)
        queries = nn.LayerNorm(name="final_norm")(queries)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1 : 1 + num_masks]

        # upscale image features 4x
        up = keys.reshape(b, h, w, c)
        up = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), transpose_kernel=True, name="upscale1")(up)
        up = nn.LayerNorm(epsilon=1e-6, name="upscale_ln", use_fast_variance=False)(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2), transpose_kernel=True, name="upscale2")(up)
        up = nn.gelu(up, approximate=False)  # [B, 4h, 4w, c/8]

        hyper = []
        for m in range(num_masks):
            t = mask_out[:, m]
            for d in range(3):
                t = nn.Dense(
                    c // 8 if d == 2 else self.embed_dim, name=f"hyper{m}_lin{d}"
                )(t)
                if d < 2:
                    t = nn.relu(t)
            hyper.append(t)
        hyper = jnp.stack(hyper, axis=1)  # [B, M, c/8]
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)

        t = iou_out
        for d in range(self.iou_head_depth):
            t = nn.Dense(
                num_masks if d == self.iou_head_depth - 1 else self.iou_head_hidden,
                name=f"iou_lin{d}",
            )(t)
            if d < self.iou_head_depth - 1:
                t = nn.relu(t)
        return masks, t


SAM_CONFIGS = {
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, global_attn_indexes=(2, 5, 8, 11)),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16, global_attn_indexes=(7, 15, 23, 31)),
}

SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)  # RGB
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SAM(nn.Module):
    """Bundled encoder + prompt encoder + mask decoder."""

    model_type: str = "vit_b"
    img_size: int = 1024

    def setup(self):
        cfg = SAM_CONFIGS[self.model_type]
        self.image_encoder = SAMImageEncoder(
            img_size=self.img_size,
            embed_dim=cfg["embed_dim"],
            depth=cfg["depth"],
            num_heads=cfg["num_heads"],
            global_attn_indexes=cfg["global_attn_indexes"],
        )
        grid = self.img_size // 16
        self.prompt_encoder = PromptEncoder(
            image_embedding_size=(grid, grid),
            input_image_size=(self.img_size, self.img_size),
        )
        self.mask_decoder = MaskDecoder()

    def encode_image(self, x):
        return self.image_encoder(x)

    def decode_boxes(self, image_embed, boxes):
        """image_embed [1, H, W, 256]; boxes [B, 4] (model-input coords)
        -> (masks [B, 4, 4H, 4W] logits, iou [B, 4])."""
        sparse, dense = self.prompt_encoder(boxes=boxes)
        pe = self.prompt_encoder.dense_pe()
        return self.mask_decoder(image_embed, pe, sparse, dense)

    def decode_points(self, image_embed, points, labels):
        sparse, dense = self.prompt_encoder(points=points, labels=labels)
        pe = self.prompt_encoder.dense_pe()
        return self.mask_decoder(image_embed, pe, sparse, dense)

    def __call__(self, x, boxes):
        emb = self.encode_image(x)
        return self.decode_boxes(emb, boxes)
