"""Image-batched, resident-tile Pallas ROIAlign with fused objectness gate.

Round-2 redesign of the pooling hot path (reference semantics:
torchvision ROIAlign V2 as selected by ``POOLER_TYPE: ROIAlignV2``; the gate
is the WSOVOD objectness scaling of ``roi_heads.py:727-744``).

Design (vs the round-1 windowed-DMA kernels in ``roi_align_kernel.py``):

* **Resident feature tile**: the whole ``[H, W, c_tile]`` tile of one image
  is DMA'd into VMEM once per ``(image, c_tile)`` grid combination and every
  ROI — any size — samples it with VMEM slices. HBM traffic for features
  drops to exactly one full read; there are no per-ROI window DMAs, no
  semaphore juggling, and no size-bucket passes (hence no cross-pass selects
  and no bucket-overlap subtleties: the narrow/wide split below is decided
  in-kernel by a single expression, an exact partition).
* **Image-batched**: one ``pallas_call`` covers the whole batch
  (grid ``(B, c_tiles, roi_blocks)``), replacing 4 x 2 per-image launches.
* **Gate folding**: each ROI's pooled output is scaled by its prefetched
  ``gate = (objectness + 1) * valid`` scalar inside the kernel, removing the
  full-tensor gating pass over the ``[B, P, 7, 7, C]`` pooled array.
* **Scalar-core y metadata**: the y sample positions / bilinear rows are
  computed as scalars (straight from SMEM ROI coords), so row indexing never
  round-trips a vector register through the scalar core — the dominant
  per-ROI fixed cost of the round-1 kernel.
* **x as matmul**: per y-sample-row, the x-interpolation AND the bin-sum are
  one ``[P, win]`` one-hot-weighted matrix ``Bx`` applied on the MXU; ROIs
  narrower than 54 feature px use a 64-wide window slice (8-aligned), wider
  ones the full row. Both read the same resident tile.

The kernel is exact (bit-comparable to the gather path modulo f32 summation
order) for every ROI size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NARROW_WIN = 64
NARROW_EXT = 54.0  # max x-extent (feature px) provably covered by a 64 window

# Flipped by CPU tests to run the kernel (incl. the AD wrapper, whose
# custom_vjp signature has no room for an interpret arg) in interpret mode.
_INTERPRET = False


def _fused_kernel(
    rois_ref,  # [B*N*5] SMEM scalar prefetch: x1,y1,x2,y2,gate per ROI
    cbase_ref,  # [1] SMEM: channel base offset of this chunk
    feat_hbm,  # [B, H, W_dma, C] ANY/HBM
    out_ref,  # [1, P, P, RB, CT] (hwnc) or [1, RB, P, P, CT] VMEM
    scale_ref,  # [1, 1, RB] VMEM int8 scales, or None (bf16 path)
    full_buf,  # [1, H, W_dma, CT] VMEM resident tile
    sem,  # DMA semaphore
    *,
    p: int,
    s: int,
    spatial_scale: float,
    roi_block: int,
    n_pad: int,
    h_lim: int,
    w_lim: int,
    w_dma: int,
    c_tile: int,
    narrow_enabled: bool,
    precision,
    hwnc_out: bool,
    quant: str = "none",
):
    b = pl.program_id(0)
    ct_i = pl.program_id(1)
    rbi = pl.program_id(2)
    # c_base and c_tile are both 128-multiples (asserted in the wrapper); the
    # hint lets Mosaic slice the lane-tiled HBM memref at a dynamic offset.
    c0 = pl.multiple_of(cbase_ref[0] + ct_i * c_tile, 128)

    # Load this (image, channel-tile) resident tile once; rbi is the
    # innermost grid dim so the tile persists across all ROI blocks. The
    # buffer has one extra guard row (zeroed) so 2-row slab reads at the
    # bottom edge stay in bounds with an exactly-zero contribution.
    @pl.when(rbi == 0)
    def _():
        cp = pltpu.make_async_copy(
            feat_hbm.at[pl.ds(b, 1), :, :, pl.ds(c0, c_tile)],
            full_buf.at[:, : h_lim],
            sem,
        )
        cp.start()
        cp.wait()
        full_buf[0, h_lim] = jnp.zeros((w_dma, c_tile), full_buf.dtype)

    k = p * s
    inv_s2 = 1.0 / float(s * s)
    grid_k = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0].astype(jnp.float32)
    ph_of_k = jnp.floor(grid_k / s)
    sub_of_k = (grid_k - ph_of_k * s + 0.5) / s

    for i in range(roi_block):
        r = b * n_pad + rbi * roi_block + i
        x1 = rois_ref[r * 5 + 0] * spatial_scale - 0.5
        y1 = rois_ref[r * 5 + 1] * spatial_scale - 0.5
        x2 = rois_ref[r * 5 + 2] * spatial_scale - 0.5
        y2 = rois_ref[r * 5 + 3] * spatial_scale - 0.5
        gate = rois_ref[r * 5 + 4]

        bin_h = (y2 - y1) / p
        bin_w = (x2 - x1) / p

        # ---- scalar-core y metadata (one tuple per sample row) ----
        ymeta = []
        for kk in range(k):
            ph = kk // s
            sub = (kk - ph * s + 0.5) / s
            ys = y1 + (ph + sub) * bin_h  # scalar f32
            yok = jnp.logical_and(ys >= -1.0, ys <= float(h_lim)).astype(
                jnp.float32
            )
            yc = jnp.clip(ys, 0.0, float(h_lim - 1))
            ylo = jnp.floor(yc)
            yhi = jnp.minimum(ylo + 1.0, float(h_lim - 1)).astype(jnp.int32)
            w_hi = yc - ylo
            ymeta.append((ylo.astype(jnp.int32), yhi, (1.0 - w_hi) * yok, w_hi * yok))

        # ---- vector-side x metadata ----
        xs = x1 + (ph_of_k + sub_of_k) * bin_w  # [k]
        xok = jnp.logical_and(xs >= -1.0, xs <= float(w_lim))
        xc = jnp.clip(xs, 0.0, float(w_lim - 1))
        xlo_f = jnp.floor(xc)
        xhi_f = jnp.minimum(xlo_f + 1.0, float(w_lim - 1))
        wx1 = xc - xlo_f
        wx0 = (1.0 - wx1) * xok.astype(jnp.float32)
        wx1 = wx1 * xok.astype(jnp.float32)
        xlo = xlo_f.astype(jnp.int32)
        xhi = xhi_f.astype(jnp.int32)

        scale_out = gate * inv_s2

        def compute(origin, win, acc_ref):
            # Bx[pw, col]: x-interp + bin-sum one-hot weight matrix
            col = jax.lax.broadcasted_iota(jnp.int32, (k, win), 1) + origin
            wx_mat = jnp.where(col == xlo[:, None], wx0[:, None], 0.0) + jnp.where(
                col == xhi[:, None], wx1[:, None], 0.0
            )  # [k, win]
            bx = wx_mat.reshape(p, s, win).sum(axis=1)  # [p, win]
            # bf16 features: y-interpolation ON THE MXU via one K=2*win dot
            # per sample row — the 2-row slab [ylo, ylo+1] is contiguous in
            # VMEM (the zeroed guard row keeps the bottom edge in bounds with
            # an exactly-zero wy1 contribution) and the wy weights fold into
            # the tiny LHS, leaving the VPU with ~1K ops instead of the f32
            # [win, CT] blend. f32 features keep the exact blended path.
            bf16_path = full_buf.dtype == jnp.bfloat16
            for kk in range(k):
                ylo_s, yhi_s, wy0_s, wy1_s = ymeta[kk]
                if bf16_path:
                    if win == w_dma:
                        slab = full_buf[0, pl.ds(ylo_s, 2)]
                    else:
                        slab = full_buf[0, pl.ds(ylo_s, 2), pl.ds(origin, win)]
                    slab2 = slab.reshape(2 * win, c_tile)
                    bx2 = jnp.concatenate(
                        [bx * wy0_s, bx * wy1_s], axis=1
                    ).astype(jnp.bfloat16)  # [p, 2*win]
                    contrib = jnp.dot(
                        bx2, slab2, preferred_element_type=jnp.float32
                    )
                else:
                    if win == w_dma:
                        row_lo = full_buf[0, ylo_s]
                        row_hi = full_buf[0, yhi_s]
                    else:
                        row_lo = full_buf[0, ylo_s, pl.ds(origin, win)]
                        row_hi = full_buf[0, yhi_s, pl.ds(origin, win)]
                    row = (
                        row_lo.astype(jnp.float32) * wy0_s
                        + row_hi.astype(jnp.float32) * wy1_s
                    )  # [win, CT]
                    # force full-precision MXU passes (the TPU default
                    # truncates f32 matmul inputs to bf16)
                    contrib = jnp.dot(
                        bx, row, preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                ph = kk // s
                if kk % s == 0:
                    acc_ref[ph] = contrib
                else:
                    acc_ref[ph] += contrib
            if quant == "int8":
                # fused int8 emission: per-(ROI, chunk) maxabs of the raw
                # accumulator; gate and 1/s^2 fold into the emitted scale so
                # the payload itself is gate-free
                acc = acc_ref[...]
                maxabs = jnp.max(jnp.abs(acc))
                inv = jnp.where(maxabs > 1e-20, 127.0 / maxabs, 0.0)
                q = jnp.round(acc * inv).astype(jnp.int8)
                out_ref[0, :, :, i] = q
                # scales block spans all of N_pad in SMEM (scalar stores;
                # small trailing blocks are not tileable)
                scale_ref[0, 0, rbi * roi_block + i] = (
                    scale_out * maxabs * (1.0 / 127.0)
                )
            elif hwnc_out:
                # [B, P, P, RB, CT] output: the default layout of this shape
                # IS the fc1 einsum's preferred operand layout (c minor, then
                # roi, w, h, b), so XLA inserts no relayout copy downstream
                out_ref[0, :, :, i] = (acc_ref[...] * scale_out).astype(
                    out_ref.dtype
                )
            else:
                out_ref[0, i] = (acc_ref[...] * scale_out).astype(out_ref.dtype)

        def body(acc_ref):
            if narrow_enabled:
                narrow = (x2 - x1) <= NARROW_EXT
                x0 = jnp.clip(
                    jnp.floor(x1).astype(jnp.int32), 0, w_dma - NARROW_WIN
                )
                x0 = pl.multiple_of((x0 // 8) * 8, 8)

                @pl.when(narrow)
                def _():
                    compute(x0, NARROW_WIN, acc_ref)

                @pl.when(jnp.logical_not(narrow))
                def _():
                    compute(jnp.int32(0), w_dma, acc_ref)
            else:
                compute(jnp.int32(0), w_dma, acc_ref)

        pl.run_scoped(body, pltpu.VMEM((p, p, c_tile), jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size",
        "spatial_scale",
        "sampling_ratio",
        "c_take",
        "c_tile",
        "roi_block",
        "interpret",
        "hwnc_out",
        "quant",
    ),
)
def roi_align_fused_batched(
    feat: jnp.ndarray,  # [B, H, W, C]
    rois: jnp.ndarray,  # [B, N, 4] (image coords, XYXY)
    gate: jnp.ndarray,  # [B, N] per-ROI output scale ((obj+1)*valid; pads 0)
    c_base=0,  # dynamic scalar: first channel of this chunk
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    c_take: int | None = None,  # channels pooled in this call (chunk width)
    c_tile: int | None = None,
    roi_block: int | None = None,
    interpret: bool = False,
    hwnc_out: bool = False,
    quant: str = "none",
) -> jnp.ndarray:
    """Pool ``feat[..., c_base:c_base+c_take]`` for every ROI of every image.

    Returns ``[B, N, P, P, c_take]`` in ``feat.dtype``, already scaled by
    ``gate``. One compiled program serves every chunk of the same width
    (``c_base`` is a runtime scalar). With ``hwnc_out`` the output is
    ``[B, P, P, N, c_take]`` — physically the layout the chunked-fc1 einsum
    contracts without a relayout copy (~27 ms/2GB chunk saved).

    ``quant='int8'`` (requires ``hwnc_out``) emits the int8 payload plus
    per-(ROI, c-tile) scales ``[B, c_take//c_tile, N]`` f32 with the gate and
    1/s^2 normalization folded in — returns ``(payload, scales)``.
    """
    b, h, w, c = feat.shape
    n = rois.shape[1]
    p = output_size
    s = max(sampling_ratio, 1)
    c_take = c if c_take is None else c_take
    if roi_block is None:
        roi_block = 16  # int8 sub-tile (32-sublane) stores are masked, fine
    if quant == "int8":
        assert hwnc_out, "int8 emission implemented for the hwnc layout only"

    # The ROI table is scalar-prefetched into SMEM (1 MB on v5e). Large
    # batches exceed it -> split into image groups of equal size and concat.
    # Splitting costs a 2 GB/chunk concatenate copy downstream, so the budget
    # is deliberately close to the hardware limit (B=8 @ 5024 ROIs = 803 KB
    # fits single-call).
    smem_budget = 960 * 1024
    n_pad_est = n + (-n) % roi_block
    if b * n_pad_est * 5 * 4 > smem_budget:
        g = b
        while g > 1 and (g * n_pad_est * 5 * 4 > smem_budget or b % g != 0):
            g -= 1
        parts = [
            roi_align_fused_batched(
                feat[i : i + g], rois[i : i + g], gate[i : i + g], c_base,
                output_size=output_size, spatial_scale=spatial_scale,
                sampling_ratio=sampling_ratio, c_take=c_take, c_tile=c_tile,
                roi_block=roi_block, interpret=interpret, hwnc_out=hwnc_out,
                quant=quant,
            )
            for i in range(0, b, g)
        ]
        if quant == "int8":
            return (
                jnp.concatenate([x[0] for x in parts], axis=0),
                jnp.concatenate([x[1] for x in parts], axis=0),
            )
        return jnp.concatenate(parts, axis=0)

    if c_tile is None:
        # largest tile whose resident buffer fits in VMEM (~16 MB/core; keep
        # ~3.5 MB for the out blocks + accumulator). Bigger tiles amortize
        # the per-ROI scalar metadata across more channels: 512 vs 256
        # measured 121 vs 164 ms at the COCO bench shape.
        itemsize = 2 if feat.dtype == jnp.bfloat16 else 4
        c_tile = 512
        while c_tile > 128 and (
            (h + 1) * (-(-w // 8) * 8) * c_tile * itemsize > 12_500_000
            or c_take % c_tile != 0
        ):
            c_tile //= 2
    assert c_take % c_tile == 0, (c_take, c_tile)
    assert c_tile % 128 == 0, c_tile  # c_base must also be a 128-multiple

    w_dma = -(-w // 8) * 8
    if w_dma != w:
        feat = jnp.pad(feat, ((0, 0), (0, 0), (0, w_dma - w), (0, 0)))
    narrow_enabled = w_dma > NARROW_WIN

    pad = (-n) % roi_block
    n_pad = n + pad
    rois_p = jnp.pad(rois.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    gate_p = jnp.pad(gate.astype(jnp.float32), ((0, 0), (0, pad)))
    rois5 = jnp.concatenate([rois_p, gate_p[..., None]], axis=-1).reshape(-1)
    cbase = jnp.asarray([c_base], jnp.int32)

    n_ct = c_take // c_tile
    out_dtype = jnp.int8 if quant == "int8" else feat.dtype
    if hwnc_out:
        out_spec = pl.BlockSpec(
            (1, p, p, roi_block, c_tile),
            lambda bi, ci, rbi, *_: (bi, 0, 0, rbi, ci),
        )
        out_shape_full = (b, p, p, n_pad, c_take)
    else:
        out_spec = pl.BlockSpec(
            (1, roi_block, p, p, c_tile),
            lambda bi, ci, rbi, *_: (bi, rbi, 0, 0, ci),
        )
        out_shape_full = (b, n_pad, p, p, c_take)
    out_specs = [out_spec]
    out_shapes = [jax.ShapeDtypeStruct(out_shape_full, out_dtype)]
    if quant == "int8":
        out_specs.append(
            pl.BlockSpec(
                (1, 1, n_pad),
                lambda bi, ci, rbi, *_: (bi, ci, 0),
                memory_space=pltpu.SMEM,
            )
        )
        out_shapes.append(jax.ShapeDtypeStruct((b, n_ct, n_pad), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_ct, n_pad // roi_block),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs if quant == "int8" else out_specs[0],
        scratch_shapes=[
            # +1 zeroed guard row for the bottom-edge 2-row slab reads
            pltpu.VMEM((1, h + 1, w_dma, c_tile), feat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _fused_kernel,
        p=p,
        s=s,
        spatial_scale=spatial_scale,
        roi_block=roi_block,
        n_pad=n_pad,
        h_lim=h,
        w_lim=w,
        w_dma=w_dma,
        c_tile=c_tile,
        narrow_enabled=narrow_enabled,
        precision=(
            jax.lax.Precision.HIGHEST
            if feat.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
        hwnc_out=hwnc_out,
        quant=quant,
    )

    def kernel_entry(rois_s, cbase_s, feat_ref, *rest):
        if quant == "int8":
            out_r, scale_r, full, sem_ = rest
        else:
            (out_r, full, sem_) = rest
            scale_r = None
        kernel(rois_s, cbase_s, feat_ref, out_r, scale_r, full, sem_)

    out = pl.pallas_call(
        kernel_entry,
        grid_spec=grid_spec,
        out_shape=out_shapes if quant == "int8" else out_shapes[0],
        interpret=interpret or _INTERPRET,
    )(rois5, cbase, feat)
    if quant == "int8":
        return out[0][:, :, :, :n], out[1][..., :n]
    return out[:, :, :, :n] if hwnc_out else out[:, :n]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8)
)
def roi_align_fused_ad(
    feat,  # [B, H, W, C]
    rois,  # [B, N, 4]
    gate,  # [B, N] ((objectness+1)*valid; exactly 0 on pads)
    c_base: int = 0,
    c_take: int | None = None,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    hwnc_out: bool = False,
):
    """Differentiable fused pool+gate. Forward = the Pallas kernel; backward
    computes the feature cotangent by transposing the (linear-in-feat)
    gather-path ROIAlign and the gate cotangent from the saved output
    (``gate`` is (objectness+1) >= 1 on valid rows, so out/gate is safe)."""
    return roi_align_fused_batched(
        feat, rois, gate, c_base=c_base, c_take=c_take,
        output_size=output_size, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio, hwnc_out=hwnc_out,
    )


def _fused_ad_fwd(feat, rois, gate, c_base, c_take, output_size, spatial_scale, sampling_ratio, hwnc_out):
    out = roi_align_fused_batched(
        feat, rois, gate, c_base=c_base, c_take=c_take,
        output_size=output_size, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio, hwnc_out=hwnc_out,
    )
    return out, (feat, rois, gate, out)


def _fused_ad_bwd(c_base, c_take, output_size, spatial_scale, sampling_ratio, hwnc_out, res, g):
    from ..roi_pool import roi_align

    feat, rois, gate, out = res
    c_take = feat.shape[-1] if c_take is None else c_take
    if hwnc_out:  # [B, P, P, N, CT] -> [B, N, P, P, CT]
        g = jnp.transpose(g, (0, 3, 1, 2, 4))
        out = jnp.transpose(out, (0, 3, 1, 2, 4))

    gf = g.astype(jnp.float32)
    safe = jnp.where(jnp.abs(gate) > 1e-8, gate, 1.0)
    g_gate = jnp.where(
        jnp.abs(gate) > 1e-8,
        jnp.sum(gf * out.astype(jnp.float32), axis=(2, 3, 4)) / safe,
        0.0,
    ).astype(gate.dtype)

    def lin(f):  # linear in f for fixed rois/gate
        fs = jax.lax.slice_in_dim(f, c_base, c_base + c_take, axis=-1)
        pooled = jnp.stack(
            [
                roi_align(
                    fs[b], rois[b], output_size, spatial_scale,
                    sampling_ratio=sampling_ratio,
                )
                for b in range(rois.shape[0])
            ]
        )
        return pooled * gate[:, :, None, None, None].astype(pooled.dtype)

    (g_feat,) = jax.linear_transpose(lin, feat)(g.astype(feat.dtype))
    return g_feat, None, g_gate


roi_align_fused_ad.defvjp(_fused_ad_fwd, _fused_ad_bwd)
