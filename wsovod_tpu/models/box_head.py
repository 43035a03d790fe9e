"""DiscriminativeAdaptationNeck (DAN) box head.

Reference ``wsovod/modeling/roi_heads/box_head.py:18-106``: optional 3x3
convs (0 in all shipped configs) then FC layers DAN_DIM=[4096, 4096], each
ReLU + Dropout(0.5). The two 4096-d FCs over up-to-12k pooled ROIs per image
are the hottest GEMMs in the model — on TPU they run as one batched
``[B*P, 7*7*C] x [7*7*C, 4096]`` matmul on the MXU.

Flatten order note: torch flattens pooled NCHW features as (c, h, w); we keep
NHWC and flatten as (h, w, c). The weight importer permutes fc1 accordingly.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ConvNorm


class ChunkedDenseGeneral(nn.Module):
    """Param-compatible with ``nn.DenseGeneral(axis=(-3, -2, -1))`` over
    (h, w, c), applied channel-chunk-wise: callers pass the pooled features as
    a list of chunks and the full ``[..., p, p, C]`` tensor never
    materializes (the WSOVOD pooled tensor is ~1 GB/image at the COCO
    proposal budget). Partial products accumulate in f32.

    Chunk layouts: ``nhwc`` = ``[B, N, p, p, c_i]``; ``hwnc`` =
    ``[B, p, p, N, c_i]`` (or ``[3, B, p, p, N, c_i]`` for ROILoopPool's
    triple rows) — Pallas fused-pool outputs the einsum contracts copy-free
    on TPU; ``n56c`` = ``[(3,) B, N, 56, c_i]`` — the (ph, pw)-flattened,
    zero-padded-to-56 layout of the kernels' sublane-aligned per-ROI store
    (the fc1 kernel rows are padded to 56 with zeros to match; the pad rows
    of both operands are zero, so the product is exact); ``w8hc`` =
    ``[B, N, 8(pw), 8*c_i]`` — the fused pool kernel's single-dot stage-B
    layout (pw on sublanes, (ph, c) on lanes; pw=7 rows and ph=7 lane
    blocks zero, matched by zero-padding the kernel, so exact).

    A chunk may also be a ``(int8 payload, per-ROI scale)`` tuple — the
    fused pooling kernels' pre-quantized emission (hwnc/n56c): the int8 GEMM
    then runs directly on the payload with the activation scale applied to
    the int32 product, no quantize pass here."""

    features: int
    in_shape: Tuple[int, int, int]  # (p, p, c_total)
    dtype: str | None = None
    chunk_layout: str = "nhwc"
    # "int8": dynamic per-ROI activation scales x per-output-column weight
    # scales, int8 MXU matmul (2x bf16 peak on v5e; measured ~1.4x end-to-end
    # on fc1 with p99 rel err ~0.6%). Set via TPU.DAN_FC1_QUANT.
    quant: str = "none"

    @nn.compact
    def __call__(self, chunks, row_gate=None) -> jnp.ndarray:
        """``row_gate`` ([..., N], nonnegative): applied to the ACCUMULATED
        fc1 output instead of the pooled input (fc1 is linear, bias added
        after, and ReLU commutes with nonnegative scales) — the training
        path pools UNGATED chunks so the gate gradient comes from this
        cheap [.., N, F] product and, with a frozen backbone, XLA drops the
        multi-GB pooled-tensor cotangent (dx GEMM + pool VJP) entirely."""
        p1, p2, c_total = self.in_shape
        kernel = self.param(
            "kernel", nn.initializers.normal(0.005), (p1, p2, c_total, self.features)
        )
        bias = self.param("bias", nn.initializers.constant(0.1), (self.features,))
        first = chunks[0][0] if isinstance(chunks[0], tuple) else chunks[0]
        dt = jnp.dtype(self.dtype) if self.dtype else (
            first.dtype if first.dtype != jnp.int8 else jnp.bfloat16
        )
        hwnc = self.chunk_layout == "hwnc"
        n56c = self.chunk_layout == "n56c"
        w8hc = self.chunk_layout == "w8hc"
        if hwnc:
            eq = "rbhwnc,hwcf->rbnf" if len(first.shape) == 6 else "bhwnc,hwcf->bnf"
        elif n56c:
            eq = "rbnkc,kcf->rbnf" if len(first.shape) == 5 else "bnkc,kcf->bnf"
        elif w8hc:
            assert len(first.shape) == 4, "w8hc chunks are plain-pool only"
            eq = "bnwk,wkf->bnf"
        else:
            eq = "...hwc,hwcf->...f"

        def k_slice(c0, ci):
            k = jax.lax.slice_in_dim(kernel, c0, c0 + ci, axis=2)
            if n56c:
                # [p, p, ci, F] -> [p*8, ci, F]: row ph*8 + pw with the pw
                # pad rows zero, matching the kernels' per-ROI store layout
                # (both pads zero => the contraction is exact)
                k = jnp.pad(k, ((0, 0), (0, 8 - p2), (0, 0), (0, 0)))
                k = k.reshape(p1 * 8, ci, self.features)
            elif w8hc:
                # [p(ph), p(pw), ci, F] -> [8(pw), 8(ph)*ci, F]: the chunk's
                # lane axis packs (ph-block, c); pads zero on both operands
                k = jnp.transpose(k, (1, 0, 2, 3))
                k = jnp.pad(k, ((0, 8 - p2), (0, 8 - p1), (0, 0), (0, 0)))
                k = k.reshape(8, 8 * ci, self.features)
            return k

        acc = None
        c0 = 0
        for item in chunks:
            if callable(item):
                # deferred pooled chunk (ChunkThunk, training): remat the
                # pool -> partial-fc1 unit so the ~GB pooled chunk is
                # recomputed in backward, never saved as an einsum residual
                ci = item.shape[-1]
                k = k_slice(c0, ci)

                def unit(k_c, item=item):
                    return jnp.einsum(
                        eq, item().astype(dt), k_c.astype(dt),
                        preferred_element_type=jnp.float32,
                    )

                y = jax.checkpoint(unit)(k)
                acc = y if acc is None else acc + y
                c0 += ci
                continue
            pre_q = isinstance(item, tuple)
            x = item[0] if pre_q else item
            ci = x.shape[-1]
            k = k_slice(c0, ci)
            w_red = (0, 1) if (n56c or w8hc) else (0, 1, 2)
            if pre_q and x.dtype == jnp.int8:
                # fused-kernel int8 payload + scale (gate folded into scale)
                assert hwnc or n56c, "pre-quantized chunks are hwnc/n56c only"
                s_w = jnp.maximum(jnp.max(jnp.abs(k), axis=w_red), 1e-8) / 127.0
                k_q = jnp.clip(jnp.round(k / s_w), -127, 127).astype(jnp.int8)
                y = jnp.einsum(eq, x, k_q, preferred_element_type=jnp.int32)
                y = y.astype(jnp.float32) * item[1][..., None] * s_w
            elif self.quant == "int8" or pre_q:
                # per-ROI activation scale: reduce over the pooled dims,
                # keep leading [(3,) B] and the N axis
                if hwnc:
                    red = (x.ndim - 4, x.ndim - 3, x.ndim - 1)
                elif n56c or w8hc:
                    red = (x.ndim - 2, x.ndim - 1)
                else:
                    red = tuple(range(x.ndim - 3, x.ndim))
                if pre_q:
                    # (float payload, per-ROI maxabs) from the pool kernels'
                    # quant='maxabs' emission: the full-chunk maxabs reduce
                    # pass disappears — this pass reads the chunk ONCE
                    assert hwnc, "maxabs chunks are hwnc-layout only"
                    ax = jnp.expand_dims(item[1], red)
                else:
                    ax = jnp.max(
                        jnp.abs(x.astype(jnp.float32)), axis=red, keepdims=True
                    )
                s_a = jnp.maximum(ax, 1e-8) / 127.0
                x_q = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / s_a), -127, 127
                ).astype(jnp.int8)
                s_w = jnp.maximum(jnp.max(jnp.abs(k), axis=w_red), 1e-8) / 127.0
                k_q = jnp.clip(jnp.round(k / s_w), -127, 127).astype(jnp.int8)
                y = jnp.einsum(eq, x_q, k_q, preferred_element_type=jnp.int32)
                if hwnc:
                    scale = jnp.squeeze(s_a, axis=(x.ndim - 4, x.ndim - 3))
                elif n56c or w8hc:
                    scale = jnp.squeeze(s_a, axis=(x.ndim - 1,))
                else:
                    scale = jnp.squeeze(
                        s_a, axis=tuple(range(x.ndim - 3, x.ndim - 1))
                    )
                y = y.astype(jnp.float32) * scale * s_w
            else:
                y = jnp.einsum(
                    eq, x.astype(dt), k.astype(dt),
                    preferred_element_type=jnp.float32,
                )
            acc = y if acc is None else acc + y
            c0 += ci
        assert c0 == c_total, (c0, c_total)
        if row_gate is not None:
            acc = acc * row_gate[..., None].astype(acc.dtype)
        return (acc + bias.astype(jnp.float32)).astype(dt)


class DiscriminativeAdaptationNeck(nn.Module):
    conv_dims: Sequence[int] = ()
    fc_dims: Sequence[int] = (4096, 4096)
    conv_norm: str = ""
    dropout_rate: float = 0.5
    dtype: str | None = None  # compute dtype for the FC GEMMs (None = f32)
    fc1_quant: str = "none"  # "int8" = quantized fc1 at INFERENCE (chunked path)

    @nn.compact
    def __call__(
        self,
        x,
        *,
        train: bool = False,
        chunk_layout: str = "hwnc",
        pooled_hw: Tuple[int, int] | None = None,  # required for "n56c"
        row_gate=None,  # [..., N] nonneg gate applied to the fc1 OUTPUT
    ) -> jnp.ndarray:
        """x: [..., P, P, C] pooled features -> [..., fc_dims[-1]].

        ``x`` may also be a list/tuple of channel chunks (the fused
        pool->fc1 streaming path; layout per ``chunk_layout``, default the
        Pallas kernel's copy-free ``hwnc`` = [B, P, P, N, c_i]): fc1 is then
        applied chunk-wise via the param-compatible ``ChunkedDenseGeneral``
        and the concatenated pooled tensor never materializes. Chunked input
        requires no convs."""
        chunked = isinstance(x, (list, tuple))
        assert not (chunked and self.conv_dims), "chunked input incompatible with convs"
        assert row_gate is None or chunked, "row_gate is a chunked-fc1 feature"
        for i, d in enumerate(self.conv_dims):
            x = nn.relu(
                ConvNorm(
                    d, 3, norm=self.conv_norm, use_bias=not self.conv_norm,
                    name=f"conv{i + 1}",
                )(x)
            )
        for i, d in enumerate(self.fc_dims):
            if i == 0:
                if chunked:
                    first = x[0][0] if isinstance(x[0], tuple) else x[0]
                    if chunk_layout == "hwnc":
                        # [(3,) B, p, p, N, c_i] (or int8-payload tuples)
                        p1, p2 = first.shape[-4], first.shape[-3]
                    elif chunk_layout in ("n56c", "w8hc"):
                        # n56c [(3,) B, N, 56, c_i] / w8hc [B, N, 8, 8*c_i]:
                        # (p, p) not recoverable from the padded row count —
                        # the caller supplies it
                        assert pooled_hw is not None, (
                            f"{chunk_layout} needs pooled_hw"
                        )
                        p1, p2 = pooled_hw
                    else:
                        p1, p2 = first.shape[-3:-1]
                    c_total = sum(
                        (c[0] if isinstance(c, tuple) else c).shape[-1]
                        for c in x
                    )
                    if chunk_layout == "w8hc":
                        c_total //= 8  # lane axis packs (ph-block, c)
                    x = ChunkedDenseGeneral(
                        d, in_shape=(p1, p2, c_total), dtype=self.dtype,
                        chunk_layout=chunk_layout,
                        # round() has zero gradient — quant is inference-only
                        quant=self.fc1_quant if not train else "none",
                        name="fc1",
                    )(x, row_gate=row_gate)
                else:
                    # contract (h, w, c) directly — a reshape to [*, h*w*c]
                    # would force a physical relayout of the 1GB pooled tensor
                    x = nn.DenseGeneral(
                        d,
                        axis=(-3, -2, -1),
                        dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.005),
                        bias_init=nn.initializers.constant(0.1),
                        name="fc1",
                    )(x)
                x = nn.relu(x)
            else:
                x = nn.relu(
                    nn.Dense(
                        d,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.005),
                        bias_init=nn.initializers.constant(0.1),
                        name=f"fc{i + 1}",
                    )(x)
                )
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x

    @property
    def output_dim(self) -> int:
        return self.fc_dims[-1] if self.fc_dims else self.conv_dims[-1]


def build_box_head(cfg) -> DiscriminativeAdaptationNeck:
    assert cfg.MODEL.ROI_BOX_HEAD.NAME == "DiscriminativeAdaptationNeck"
    return DiscriminativeAdaptationNeck(
        conv_dims=tuple([cfg.MODEL.ROI_BOX_HEAD.CONV_DIM] * cfg.MODEL.ROI_BOX_HEAD.NUM_CONV),
        fc_dims=tuple(cfg.MODEL.ROI_BOX_HEAD.DAN_DIM),
        conv_norm=cfg.MODEL.ROI_BOX_HEAD.NORM,
        dtype=cfg.TPU.COMPUTE_DTYPE if cfg.TPU.COMPUTE_DTYPE != "float32" else None,
        fc1_quant=cfg.TPU.DAN_FC1_QUANT,
    )
