"""Pallas TPU kernels for exact max ROI pooling (RoIPool + ROILoopPool).

Port of the semantics of ``wsovod/layers/ROILoopPool/ROILoopPool_cuda.cu``
(and torchvision RoIPool) to a TPU-native structure. A CUDA thread-per-output
maxloop does not map to the VPU; instead each ROI is pooled in two separable
stages:

  stage A: walk the ROI's feature rows once (dynamic-trip fori), folding each
           row [W, C_TILE] into its output band ``band[ph]`` — every ROI
           pixel row is read exactly once;
  stage B: for each of the P x P bins, a masked max over the band's W axis
           (vector compare against the bin's column edges).

Grid = (c_tiles, roi_blocks) with roi_blocks innermost, so the feature tile
[H, W, C_TILE] stays resident in VMEM across all ROI blocks of a channel
tile. ROI boxes live in SMEM via scalar prefetch.

The hollow frame/context regions of ROILoopPool use the union decomposition
(a pixel is outside the hole iff outside its column span OR outside its row
span): ``max over ring = max(stage-B with hole-column mask, stage-A
restricted to non-hole rows)`` — both separable, matching the CUDA kernel's
strict-interior semantics exactly.

Empty bins produce 0; loop-pool maxima are clamped at 0 ("inputs >= 0"
convention of the reference kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.4e38


def _round_scalar(x):
    return jnp.floor(x + 0.5).astype(jnp.int32)


def _bin_edges_scalar(start, size, p):
    """Bin [lo, hi) edges for ``p`` bins as two length-p int32 vectors
    (exact integer floor/ceil division; start/size are traced scalars)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0]
    lo = (idx * size) // p + start
    hi = -((-(idx + 1) * size) // p) + start
    return lo, hi


def _pool_one_region(
    feat_ref,  # [H, W, CT] VMEM
    band,  # [P, W, CT] f32 scratch
    box,  # (x1, y1, x2, y2) traced float scalars, image coords
    hole,  # None or (hx1, hy1, hx2, hy2) rounded int feature coords
    spatial_scale: float,
    p: int,
    h_lim: int,
    w_lim: int,
    init_val: float,
):
    """Returns [P, P, CT] maxima for one ROI region (optionally hollow)."""
    x1, y1, x2, y2 = box
    rx1 = _round_scalar(x1 * spatial_scale)
    ry1 = _round_scalar(y1 * spatial_scale)
    rx2 = _round_scalar(x2 * spatial_scale)
    ry2 = _round_scalar(y2 * spatial_scale)
    rw = jnp.maximum(rx2 - rx1 + 1, 1)
    rh = jnp.maximum(ry2 - ry1 + 1, 1)
    hlo, hhi = _bin_edges_scalar(ry1, rh, p)
    wlo, whi = _bin_edges_scalar(rx1, rw, p)
    hlo = jnp.clip(hlo, 0, h_lim)
    hhi = jnp.clip(hhi, 0, h_lim)
    wlo = jnp.clip(wlo, 0, w_lim)
    whi = jnp.clip(whi, 0, w_lim)

    if hole is not None:
        hx1, hy1, hx2, hy2 = hole

    w_iota = jax.lax.broadcasted_iota(jnp.int32, (w_lim, 1), 0)  # [W, 1]

    # ---- stage A: fold each bin's rows into its band ----------------------
    # Note: adjacent bins may SHARE rows (floor/ceil edge convention), so each
    # bin walks its own [hlo, hhi) range; shared rows are read at most twice.
    band[...] = jnp.full(band.shape, init_val, band.dtype)
    for ph in range(p):
        def row_body(h, _, ph=ph):
            band[ph] = jnp.maximum(band[ph], feat_ref[h].astype(jnp.float32))
            return 0

        jax.lax.fori_loop(hlo[ph], hhi[ph], row_body, 0, unroll=False)

    # ---- stage B: masked column reductions per bin ------------------------
    outs = []
    for ph in range(p):
        b = band[ph]  # [W, CT] f32
        row_out = []
        for pw in range(p):
            col_ok = jnp.logical_and(w_iota >= wlo[pw], w_iota < whi[pw])  # [W,1]
            if hole is not None:
                out_cols = jnp.logical_or(w_iota <= hx1, w_iota >= hx2)
                col_ok = jnp.logical_and(col_ok, out_cols)
            masked = jnp.where(col_ok, b, NEG)
            row_out.append(jnp.max(masked, axis=0))  # [CT]
        outs.append(jnp.stack(row_out))
    return jnp.stack(outs)  # [P, P, CT]


def _pool_one_region_rows_outside(
    feat_ref, band, box, hole, spatial_scale, p, h_lim, w_lim, init_val
):
    """Variant of stage A restricted to rows OUTSIDE the hole's row span
    (h <= hy1 or h >= hy2), with unrestricted columns in stage B."""
    x1, y1, x2, y2 = box
    hx1, hy1, hx2, hy2 = hole
    rx1 = _round_scalar(x1 * spatial_scale)
    ry1 = _round_scalar(y1 * spatial_scale)
    rx2 = _round_scalar(x2 * spatial_scale)
    ry2 = _round_scalar(y2 * spatial_scale)
    rw = jnp.maximum(rx2 - rx1 + 1, 1)
    rh = jnp.maximum(ry2 - ry1 + 1, 1)
    hlo, hhi = _bin_edges_scalar(ry1, rh, p)
    wlo, whi = _bin_edges_scalar(rx1, rw, p)
    hlo = jnp.clip(hlo, 0, h_lim)
    hhi = jnp.clip(hhi, 0, h_lim)
    wlo = jnp.clip(wlo, 0, w_lim)
    whi = jnp.clip(whi, 0, w_lim)

    w_iota = jax.lax.broadcasted_iota(jnp.int32, (w_lim, 1), 0)

    band[...] = jnp.full(band.shape, init_val, band.dtype)
    for ph in range(p):
        def row_body(h, _, ph=ph):
            outside_rows = jnp.logical_or(h <= hy1, h >= hy2)

            @pl.when(outside_rows)
            def _():
                band[ph] = jnp.maximum(band[ph], feat_ref[h].astype(jnp.float32))

            return 0

        jax.lax.fori_loop(hlo[ph], hhi[ph], row_body, 0, unroll=False)

    outs = []
    for ph in range(p):
        b = band[ph]
        row_out = []
        for pw in range(p):
            col_ok = jnp.logical_and(w_iota >= wlo[pw], w_iota < whi[pw])
            masked = jnp.where(col_ok, b, NEG)
            row_out.append(jnp.max(masked, axis=0))
        outs.append(jnp.stack(row_out))
    return jnp.stack(outs)


def _roi_pool_kernel(rois_ref, feat_ref, out_ref, band, *, p, spatial_scale, roi_block):
    # rois_ref is the FLAT [N*4] SMEM table (2-D scalar-prefetch operands are
    # lane-padded 4 -> 128 in SMEM and overflow it at large N)
    h_lim, w_lim = feat_ref.shape[0], feat_ref.shape[1]
    rb = pl.program_id(1)
    for i in range(roi_block):
        r = rb * roi_block + i
        box = (rois_ref[r * 4], rois_ref[r * 4 + 1], rois_ref[r * 4 + 2], rois_ref[r * 4 + 3])
        pooled = _pool_one_region(
            feat_ref, band, box, None, spatial_scale, p, h_lim, w_lim, NEG
        )
        # empty bins -> 0 (torchvision convention)
        out_ref[i] = jnp.where(pooled <= NEG / 2, 0.0, pooled).astype(out_ref.dtype)


def _clipf(v, lim):
    return jnp.clip(v, 0.0, lim)


def _roi_loop_pool_kernel(
    rois_ref, feat_ref, out_ref, band, *, p, spatial_scale, context_ratio, roi_block
):
    h_lim, w_lim = feat_ref.shape[0], feat_ref.shape[1]
    img_h = h_lim / spatial_scale
    img_w = w_lim / spatial_scale
    rb = pl.program_id(1)
    for i in range(roi_block):
        r = rb * roi_block + i
        x1, y1, x2, y2 = (
            rois_ref[r * 4], rois_ref[r * 4 + 1],
            rois_ref[r * 4 + 2], rois_ref[r * 4 + 3],
        )
        rw = x2 - x1
        rh = y2 - y1
        in_dw = (rw - rw / context_ratio) * 0.5
        in_dh = (rh - rh / context_ratio) * 0.5
        out_dw = (rw * context_ratio - rw) * 0.5
        out_dh = (rh * context_ratio - rh) * 0.5
        xi1, yi1 = _clipf(x1 + in_dw, img_w), _clipf(y1 + in_dh, img_h)
        xi2, yi2 = _clipf(x2 - in_dw, img_w), _clipf(y2 - in_dh, img_h)
        xo1, yo1 = _clipf(x1 - out_dw, img_w), _clipf(y1 - out_dh, img_h)
        xo2, yo2 = _clipf(x2 + out_dw, img_w), _clipf(y2 + out_dh, img_h)

        roi_box = (x1, y1, x2, y2)
        inner_i = tuple(_round_scalar(v * spatial_scale) for v in (xi1, yi1, xi2, yi2))
        roi_i = tuple(_round_scalar(v * spatial_scale) for v in (x1, y1, x2, y2))
        outer_box = (xo1, yo1, xo2, yo2)

        # (a) plain ROI, maxval starts at 0
        pooled = _pool_one_region(
            feat_ref, band, roi_box, None, spatial_scale, p, h_lim, w_lim, NEG
        )
        out_ref[0, i] = jnp.maximum(
            jnp.where(pooled <= NEG / 2, 0.0, pooled), 0.0
        ).astype(out_ref.dtype)

        # (b) frame = ROI minus inner interior
        t1 = _pool_one_region(
            feat_ref, band, roi_box, inner_i, spatial_scale, p, h_lim, w_lim, NEG
        )
        t2 = _pool_one_region_rows_outside(
            feat_ref, band, roi_box, inner_i, spatial_scale, p, h_lim, w_lim, NEG
        )
        frame = jnp.maximum(jnp.maximum(t1, t2), 0.0)
        out_ref[1, i] = jnp.where(frame <= NEG / 2, 0.0, frame).astype(out_ref.dtype)

        # (c) context = outer minus ROI interior
        t1 = _pool_one_region(
            feat_ref, band, outer_box, roi_i, spatial_scale, p, h_lim, w_lim, NEG
        )
        t2 = _pool_one_region_rows_outside(
            feat_ref, band, outer_box, roi_i, spatial_scale, p, h_lim, w_lim, NEG
        )
        ctx = jnp.maximum(jnp.maximum(t1, t2), 0.0)
        out_ref[2, i] = jnp.where(ctx <= NEG / 2, 0.0, ctx).astype(out_ref.dtype)


def _pad_rois(rois, roi_block):
    n = rois.shape[0]
    pad = (-n) % roi_block
    if pad:
        rois = jnp.concatenate(
            [rois, jnp.zeros((pad, 4), rois.dtype)], axis=0
        )
    return rois, n


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "c_tile", "roi_block", "interpret"),
)
def roi_pool_pallas(
    feat: jnp.ndarray,  # [H, W, C]
    rois: jnp.ndarray,  # [N, 4]
    output_size: int = 7,
    spatial_scale: float = 1.0,
    c_tile: int = 128,
    roi_block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    h, w, c = feat.shape
    p = output_size
    rois_p, n = _pad_rois(rois.astype(jnp.float32), roi_block)
    n_pad = rois_p.shape[0]
    c_tile = min(c_tile, c)
    assert c % c_tile == 0, (c, c_tile)
    n_ct = c // c_tile
    n_rb = n_pad // roi_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ct, n_rb),
        in_specs=[
            pl.BlockSpec((h, w, c_tile), lambda ct, rb, rois_s: (0, 0, ct)),
        ],
        out_specs=pl.BlockSpec(
            (roi_block, p, p, c_tile), lambda ct, rb, rois_s: (rb, 0, 0, ct)
        ),
        scratch_shapes=[pltpu.VMEM((p, w, c_tile), jnp.float32)],
    )
    kernel = functools.partial(
        _roi_pool_kernel, p=p, spatial_scale=spatial_scale, roi_block=roi_block
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, p, p, c), feat.dtype),
        interpret=interpret,
    )(rois_p.reshape(-1), feat)
    return out[:n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size", "spatial_scale", "context_ratio", "c_tile", "roi_block", "interpret",
    ),
)
def roi_loop_pool_pallas(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    context_ratio: float = 1.8,
    c_tile: int = 128,
    roi_block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    h, w, c = feat.shape
    p = output_size
    rois_p, n = _pad_rois(rois.astype(jnp.float32), roi_block)
    n_pad = rois_p.shape[0]
    c_tile = min(c_tile, c)
    assert c % c_tile == 0, (c, c_tile)
    n_ct = c // c_tile
    n_rb = n_pad // roi_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ct, n_rb),
        in_specs=[
            pl.BlockSpec((h, w, c_tile), lambda ct, rb, rois_s: (0, 0, ct)),
        ],
        out_specs=pl.BlockSpec(
            (3, roi_block, p, p, c_tile), lambda ct, rb, rois_s: (0, rb, 0, 0, ct)
        ),
        scratch_shapes=[pltpu.VMEM((p, w, c_tile), jnp.float32)],
    )
    kernel = functools.partial(
        _roi_loop_pool_kernel,
        p=p,
        spatial_scale=spatial_scale,
        context_ratio=context_ratio,
        roi_block=roi_block,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, n_pad, p, p, c), feat.dtype),
        interpret=interpret,
    )(rois_p.reshape(-1), feat)
    return out[:, :n]
