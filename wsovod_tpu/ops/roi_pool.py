"""ROI pooling ops — pure-jnp reference implementations.

Ports the semantics of the reference's native layers to masked XLA ops:

* ``roi_pool`` — torchvision-style exact max RoIPool (rounded integer bin
  grid, ``+1`` width convention) as used via d2's ``ROIPool`` wrapper
  (reference ``wsovod/modeling/poolers.py``, config ``POOLER_TYPE: ROIPool``).
* ``roi_loop_pool`` — the triple ROI/frame/context pool of
  ``wsovod/layers/ROILoopPool/ROILoopPool_cuda.cu:10-203``: for each ROI,
  (a) the whole ROI, (b) the ROI minus the strict interior of the inner box
  (ROI shrunk by ``context_ratio``), (c) the outer box (ROI grown by
  ``context_ratio``) minus the strict interior of the ROI. All three use
  ``maxval`` initialised to 0 (inputs assumed >= 0, post-ReLU).
* ``roi_align`` — torchvision ROIAlign (V2 / ``aligned=True`` semantics),
  gather-based bilinear sampling; this is also the TPU fast path (pure XLA
  gather, no custom kernel needed).

The hollow (frame/context) regions are computed separably: a pixel is outside
the hole iff it is outside the hole's column span OR outside its row span, so
``max over ring = max(max over allowed-cols, max over allowed-rows)`` — two
separable masked maxes, no O(H*W) per-bin mask materialisation on the fast
axes.

These functions operate on a single image ``feat [H, W, C]`` with
``rois [N, 4]`` (XYXY in image coords); batch via ``jax.vmap``. The Pallas
fast path for exact max pooling lives in ``ops/pallas/roi_pool_kernel.py``
and is validated against these.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _bin_edges(start: jnp.ndarray, size: jnp.ndarray, pooled: int, limit: int):
    """Integer bin [lo, hi) edges for each of ``pooled`` bins.

    Args:
      start: [N] int rounded region start (pixels).
      size: [N] int region size (already max'd with 1).
      pooled: static number of output bins P.
      limit: static feature extent (H or W).

    Returns: (lo, hi): [N, P] int32, clipped to [0, limit].
    """
    # exact integer arithmetic: floor(ph*size/p) and ceil((ph+1)*size/p)
    # (float32 would overshoot the ceil at exact integers)
    p = jnp.arange(pooled, dtype=jnp.int32)  # [P]
    lo = (p[None, :] * size[:, None]) // pooled + start[:, None]
    hi = -((-(p[None, :] + 1) * size[:, None]) // pooled) + start[:, None]
    return jnp.clip(lo, 0, limit), jnp.clip(hi, 0, limit)


def _round_region(rois: jnp.ndarray, spatial_scale: float):
    """Rounded integer region (start, size) per axis, torchvision convention.

    torchvision/the CUDA reference use C ``round`` (half away from zero);
    for the non-negative coords of this pipeline ``floor(x + 0.5)`` matches
    exactly — ``jnp.round`` would round half-to-even (12.5 -> 12)."""
    r = jnp.floor(rois * spatial_scale + 0.5).astype(jnp.int32)
    x1, y1, x2, y2 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    w = jnp.maximum(x2 - x1 + 1, 1)
    h = jnp.maximum(y2 - y1 + 1, 1)
    return x1, y1, w, h


def _separable_masked_max(
    feat: jnp.ndarray,  # [H, W, C]
    row_in: jnp.ndarray,  # [N, P, H] bool — rows of each (roi, ph) bin
    col_in: jnp.ndarray,  # [N, P, W] bool — cols of each (roi, pw) bin
) -> jnp.ndarray:
    """max over {(h, w) : row_in & col_in} per (n, ph, pw) -> [N, P, P, C]."""
    # Stage 1: reduce W per (n, pw): [N, P, H, C]
    colmax = jnp.max(
        jnp.where(col_in[:, :, None, :, None], feat[None, None], NEG_INF), axis=3
    )
    # Stage 2: reduce H per (n, ph): [N, P(ph), P(pw), C]
    out = jnp.max(
        jnp.where(row_in[:, :, None, :, None], colmax[:, None], NEG_INF), axis=3
    )
    return out


@partial(jax.jit, static_argnames=("output_size", "spatial_scale"))
def roi_pool(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
) -> jnp.ndarray:
    """Exact max RoIPool. feat [H, W, C], rois [N, 4] -> [N, P, P, C].

    Empty bins produce 0 (torchvision convention).
    """
    h_lim, w_lim = feat.shape[0], feat.shape[1]
    p = output_size
    x1, y1, w, h = _round_region(rois, spatial_scale)
    hlo, hhi = _bin_edges(y1, h, p, h_lim)
    wlo, whi = _bin_edges(x1, w, p, w_lim)

    hidx = jnp.arange(h_lim)
    widx = jnp.arange(w_lim)
    row_in = (hidx[None, None, :] >= hlo[:, :, None]) & (hidx[None, None, :] < hhi[:, :, None])
    col_in = (widx[None, None, :] >= wlo[:, :, None]) & (widx[None, None, :] < whi[:, :, None])

    out = _separable_masked_max(feat, row_in, col_in)
    return jnp.where(out <= NEG_INF, 0.0, out)


def _hollow_pool(
    feat: jnp.ndarray,
    row_in: jnp.ndarray,  # [N, P, H] bin rows (over the pooling box)
    col_in: jnp.ndarray,  # [N, P, W] bin cols
    hole: tuple,  # (hx1, hy1, hx2, hy2): [N] int rounded hole coords
) -> jnp.ndarray:
    """Max over bin pixels outside the strict interior of ``hole`` -> [N,P,P,C].

    Interior per the CUDA kernel: ``h > hy1 && h < hy2 && w > hx1 && w < hx2``.
    Outside = (w <= hx1 | w >= hx2) OR (h <= hy1 | h >= hy2) — the union of two
    separable constraints, so two separable maxes suffice.
    """
    hx1, hy1, hx2, hy2 = hole
    h_lim = feat.shape[0]
    w_lim = feat.shape[1]
    hidx = jnp.arange(h_lim)
    widx = jnp.arange(w_lim)
    row_ok = (hidx[None, :] <= hy1[:, None]) | (hidx[None, :] >= hy2[:, None])  # [N, H]
    col_ok = (widx[None, :] <= hx1[:, None]) | (widx[None, :] >= hx2[:, None])  # [N, W]

    m1 = _separable_masked_max(feat, row_in, col_in & col_ok[:, None, :])
    m2 = _separable_masked_max(feat, row_in & row_ok[:, None, :], col_in)
    out = jnp.maximum(m1, m2)
    # maxval starts at 0 in the reference kernel (inputs assumed >= 0).
    return jnp.maximum(out, 0.0)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "context_ratio"))
def roi_loop_pool(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    context_ratio: float = 1.8,
) -> jnp.ndarray:
    """Triple ROI/frame/context max pool -> [3, N, P, P, C].

    Output stacking matches the reference's ``(3*num_rois, C, ph, pw)`` layout
    contract (ROI block, then frame block, then context block), here as a
    leading axis of size 3.
    """
    h_lim, w_lim = feat.shape[0], feat.shape[1]
    p = output_size
    x1f, y1f, x2f, y2f = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    rw = x2f - x1f
    rh = y2f - y1f

    # inner / outer boxes, clipped to image extent in *image* coords
    def _shrink_grow(ratio_w, ratio_h, grow):
        dw = (rw * ratio_w - rw) / 2 if grow else (rw - rw / ratio_w) / 2
        dh = (rh * ratio_h - rh) / 2 if grow else (rh - rh / ratio_h) / 2
        if grow:
            bx1, by1, bx2, by2 = x1f - dw, y1f - dh, x2f + dw, y2f + dh
        else:
            bx1, by1, bx2, by2 = x1f + dw, y1f + dh, x2f - dw, y2f - dh
        bx1 = jnp.clip(bx1, 0.0, w_lim / spatial_scale)
        by1 = jnp.clip(by1, 0.0, h_lim / spatial_scale)
        bx2 = jnp.clip(bx2, 0.0, w_lim / spatial_scale)
        by2 = jnp.clip(by2, 0.0, h_lim / spatial_scale)
        return jnp.stack([bx1, by1, bx2, by2], axis=-1)

    inner = _shrink_grow(context_ratio, context_ratio, grow=False)
    outer = _shrink_grow(context_ratio, context_ratio, grow=True)

    hidx = jnp.arange(h_lim)
    widx = jnp.arange(w_lim)

    def _bins(box):
        x1, y1, w, h = _round_region(box, spatial_scale)
        hlo, hhi = _bin_edges(y1, h, p, h_lim)
        wlo, whi = _bin_edges(x1, w, p, w_lim)
        row_in = (hidx[None, None, :] >= hlo[:, :, None]) & (
            hidx[None, None, :] < hhi[:, :, None]
        )
        col_in = (widx[None, None, :] >= wlo[:, :, None]) & (
            widx[None, None, :] < whi[:, :, None]
        )
        return row_in, col_in

    def _ints(box):
        # C round (half away from zero) for non-negative coords
        r = jnp.floor(box * spatial_scale + 0.5).astype(jnp.int32)
        return r[:, 0], r[:, 1], r[:, 2], r[:, 3]

    row_roi, col_roi = _bins(rois)

    # (a) plain ROI pool, maxval init 0
    pooled_roi = _separable_masked_max(feat, row_roi, col_roi)
    pooled_roi = jnp.maximum(jnp.where(pooled_roi <= NEG_INF, 0.0, pooled_roi), 0.0)

    # (b) frame: ROI bins minus inner-box interior
    pooled_frame = _hollow_pool(feat, row_roi, col_roi, _ints(inner))

    # (c) context: outer bins minus ROI interior
    row_out, col_out = _bins(outer)
    pooled_ctx = _hollow_pool(feat, row_out, col_out, _ints(rois))

    return jnp.stack([pooled_roi, pooled_frame, pooled_ctx], axis=0)


@partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "sampling_ratio", "aligned", "roi_chunk"),
)
def roi_align(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
    roi_chunk: int = 512,
) -> jnp.ndarray:
    """ROIAlign (torchvision V2 semantics when ``aligned=True``).

    feat [H, W, C], rois [N, 4] -> [N, P, P, C]. Static ``sampling_ratio``
    (the adaptive ``ratio=0`` mode is dynamic-shape and not XLA-expressible;
    d2 defaults effectively use a small fixed grid — we default to 2).

    ROIs are processed in ``roi_chunk`` blocks via ``lax.map`` so the
    bilinear gather intermediates stay bounded (a 5k-ROI, 2048-channel call
    would otherwise materialise ~4 GB per corner gather).
    """
    n = rois.shape[0]
    if n > roi_chunk:
        # Chunked gathers bound the bilinear intermediates. NOTE: this path
        # is deliberately a python loop and the POOLER vmaps over the batch:
        # the batched gather form prevents XLA from re-merging the per-sample
        # gathers of all chunks into one [N, P*S, P*S, C] buffer (observed
        # 3.8+ GB when unbatched — the chunk structure alone does not stop
        # the gather merger, even through scan or optimization_barrier).
        pad = (-n) % roi_chunk
        rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
        outs = [
            _roi_align_impl(
                feat,
                rois_p[i : i + roi_chunk],
                output_size,
                spatial_scale,
                sampling_ratio,
                aligned,
            )
            for i in range(0, rois_p.shape[0], roi_chunk)
        ]
        return jnp.concatenate(outs, axis=0)[:n]
    return _roi_align_impl(feat, rois, output_size, spatial_scale, sampling_ratio, aligned)


def _roi_align_impl(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int,
    aligned: bool,
) -> jnp.ndarray:
    h_lim, w_lim, _ = feat.shape
    p = output_size
    s = max(sampling_ratio, 1)
    offset = 0.5 if aligned else 0.0

    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    rw = x2 - x1
    rh = y2 - y1
    if not aligned:
        rw = jnp.maximum(rw, 1.0)
        rh = jnp.maximum(rh, 1.0)

    bin_w = rw / p  # [N]
    bin_h = rh / p

    dt = feat.dtype
    flat = feat.reshape(h_lim * w_lim, -1)  # [H*W, C]
    n = rois.shape[0]
    c = feat.shape[-1]

    def bilinear_1d(coord, limit):
        """Return (lo_idx, hi_idx, lo_wt, hi_wt, in_range)."""
        in_range = (coord >= -1.0) & (coord <= limit)
        cc = jnp.clip(coord, 0.0, limit - 1)
        lo = jnp.floor(cc)
        hi = jnp.minimum(lo + 1, limit - 1)
        wt_hi = cc - lo
        return lo.astype(jnp.int32), hi.astype(jnp.int32), 1.0 - wt_hi, wt_hi, in_range

    # Accumulate per sample point (static S x S loop) so nothing larger than
    # [N, P, P, C] is ever materialised.
    acc = jnp.zeros((n, p, p, c), dt)
    for sy in range(s):
        ys = y1[:, None] + (jnp.arange(p)[None, :] + (sy + 0.5) / s) * bin_h[:, None]
        ylo, yhi, wy0, wy1, yok = bilinear_1d(ys, h_lim)  # [N, P]
        for sx in range(s):
            xs = x1[:, None] + (jnp.arange(p)[None, :] + (sx + 0.5) / s) * bin_w[:, None]
            xlo, xhi, wx0, wx1, xok = bilinear_1d(xs, w_lim)

            def g(yi, xi):
                idx = yi[:, :, None] * w_lim + xi[:, None, :]  # [N, P, P]
                return flat[idx]  # [N, P, P, C]

            val = (
                g(ylo, xlo) * (wy0[:, :, None] * wx0[:, None, :])[..., None].astype(dt)
                + g(ylo, xhi) * (wy0[:, :, None] * wx1[:, None, :])[..., None].astype(dt)
                + g(yhi, xlo) * (wy1[:, :, None] * wx0[:, None, :])[..., None].astype(dt)
                + g(yhi, xhi) * (wy1[:, :, None] * wx1[:, None, :])[..., None].astype(dt)
            )
            ok = (yok[:, :, None] & xok[:, None, :])[..., None]
            acc = acc + jnp.where(ok, val, jnp.zeros((), dt))
    return acc / (s * s)
