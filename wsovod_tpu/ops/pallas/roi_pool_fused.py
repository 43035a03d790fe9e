"""Image-batched, resident-tile Pallas max ROI pooling (ROIPool/ROILoopPool)
with fused objectness gate and optional fused int8 emission.

Round-3 extension of the ``roi_align_fused`` design to the pooler types the
shipped configs actually use (reference ``configs/*/Base-RCNN-DilatedC5.yaml``
``POOLER_TYPE: ROIPool``; MRRP configs ``ROILoopPool``). Semantics:

* ``ROIPool`` — torchvision exact max RoIPool (rounded integer region, ``+1``
  width, floor/ceil integer bin edges, empty bins -> 0), as validated against
  ``wsovod_tpu.ops.roi_pool.roi_pool``.
* ``ROILoopPool`` — the triple ROI/frame/context pool of the reference's
  ``wsovod/layers/ROILoopPool/ROILoopPool_cuda.cu:10-203``: region (a) the
  ROI, (b) the ROI minus the strict interior of the ROI shrunk by
  ``context_ratio``, (c) the ROI grown by ``context_ratio`` minus the strict
  interior of the ROI; all three with maxval initialised to 0.

Design (shared with ``roi_align_fused``):

* **Resident feature tile**: one ``[H, W, c_tile]`` DMA per (image, c-tile),
  persisting across all ROI blocks (rbi is the innermost grid dim).
* **Image-batched**: one ``pallas_call`` per channel chunk for the whole
  batch; ROI tables ride SMEM scalar prefetch.
* **Gate folding**: outputs are scaled by the prefetched per-ROI
  ``gate = (objectness + 1) * valid`` (bf16 path), or the gate is folded into
  the emitted per-ROI int8 scale (quant path) so the payload itself is
  gate-free.
* **hwnc output**: ``[B, P, P, N, c_tile]`` — physically the chunked-fc1
  einsum's preferred operand layout (no relayout copy downstream).
* **int8 emission** (``quant='int8'``): the kernel computes the per-(ROI,
  chunk) maxabs of the pooled values, emits ``round(v * 127 / maxabs)`` as
  int8 plus a per-ROI scale ``gate * maxabs / 127`` — the downstream fc1
  int8 GEMM then needs no separate quantize pass over the pooled tensor.

Max is exact in the feature dtype (the result is always one of the inputs),
so stage buffers stay in ``feat.dtype`` — bf16 halves the VPU traffic with
zero numeric change vs an f32 walk over the same bf16 features.

Per-ROI structure: plain-pool integer bin edges are precomputed VECTORIZED
in XLA and prefetched as packed int16 pairs (``_pack_region_meta``) — the
kernel's scalar core only loads + shift-unpacks them (the in-kernel float
math it replaces serialized ~33 ms across the bench sweep); ROILoopPool's
richer two-region geometry is still computed as scalars from the SMEM ROI
coords. Stage A walks each output row's feature rows once (dynamic-trip
``fori``) folding them into a band ``[P, win, CT]``; stage B is a
vectorized masked max over the band per output column. Narrow ROIs use an
8-aligned 64-wide x-window slice of the resident tile; wide ones the full
row (the split is decided in-kernel, an exact partition).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # representable in bf16 and f32


def _neg_for(dtype):
    """Band/init fill for "empty" under max. Floats: NEG. int8 (the tile8
    pre-quantized walk): -128 — quantized features clip to [-127, 127], so
    -128 uniquely marks an empty bin (detected at <= -127.5 in f32)."""
    if jnp.dtype(dtype) == jnp.int8:
        return jnp.int8(-128)
    return jnp.dtype(dtype).type(NEG)


# narrow x-window (feature px) for plain ROIPool (covers rw <= 41 — every
# ROI of the COCO bench distribution, keeping the narrow/wide branch
# coherent). Measured at the bench shape (B8 x 5024 x 2048ch): win48 350 ms
# vs win64 405 vs win32 438 (win32 pushes ~35% of ROIs to the incoherent
# full-width branch). Multiple per-ROI window classes and roi_block != 8
# were all slower; see git history.
POOL_WIN = 48
LOOP_WIN = 96  # narrow x-window for ROILoopPool (covers the 1.8x outer box)
# width classes for class-SORTED plain pooling (one static-window branch per
# 8-ROI block): (x-window px, stage-B one-hot candidates per bin); the last
# (None) class is the full-row wide path. Class c covers rw <= w_sl - 7
# (8-alignment slop); j_cap = ceil((w_sl - 7) / p) + 1 candidate columns.
POOL_WIN_CLASSES = ((24, 4), (48, 8), (96, 16), (None, None))

# scalar-prefetch SMEM budget for the per-ROI tables (the hardware bank is
# 1 MB; headroom for the other scalar operands). Oversized tables B-split.
SMEM_BUDGET = 960 * 1024

# Flipped by CPU tests to run the kernels (incl. the AD wrappers, whose
# custom_vjp signatures have no room for an interpret arg) in interpret mode.
_INTERPRET = False


def _w_edges(rx1, rw, p, w_lim):
    """Per-bin [lo, hi) x edges, lazily forced: only the full-row wide
    branch needs them as scalars — the narrow/MXU stage B recomputes its w
    edges vectorized on the VPU (the scalar-core serialization of the 28
    per-ROI edge computations cost ~36 ms across the bench sweep when
    eager; measured v5e)."""
    wlo = [jnp.clip((pw * rw) // p + rx1, 0, w_lim) for pw in range(p)]
    whi = [
        jnp.clip(-((-(pw + 1) * rw) // p) + rx1, 0, w_lim) for pw in range(p)
    ]
    return wlo, whi


def _meta_words(p: int) -> int:
    """int32 word count of the packed per-ROI region meta (int16 pairs)."""
    return (2 + 2 * p + 1) // 2


def pool_width_classes(rois, spatial_scale, w):
    """Per-ROI width class ids ([..., N] int32 into ``POOL_WIN_CLASSES``)
    for class-sorted fused plain pooling. Classes whose window exceeds the
    8-aligned feature width collapse into the wide class."""
    x1, x2 = rois[..., 0], rois[..., 2]
    rx1 = jnp.floor(x1 * spatial_scale + 0.5).astype(jnp.int32)
    rx2 = jnp.floor(x2 * spatial_scale + 0.5).astype(jnp.int32)
    rw = jnp.maximum(rx2 - rx1 + 1, 1)
    w_dma = -(-w // 8) * 8
    cls = jnp.full(rw.shape, len(POOL_WIN_CLASSES) - 1, jnp.int32)
    for cid in range(len(POOL_WIN_CLASSES) - 2, -1, -1):
        w_sl, _ = POOL_WIN_CLASSES[cid]
        if w_sl is not None and w_dma >= w_sl:
            cls = jnp.where(rw <= w_sl - 7, jnp.int32(cid), cls)
    return cls


def _region_meta_vals(x1, y1, x2, y2, spatial_scale, p, h_lim):
    """Vectorized region metadata value list ``[rx1, rw, hlo*p, hhi*p]``
    (same floor/ceil integer formulas as the kernel-side ``_region_meta``)."""

    def rnd(v):
        return jnp.floor(v * spatial_scale + 0.5).astype(jnp.int32)

    rx1, ry1, rx2, ry2 = rnd(x1), rnd(y1), rnd(x2), rnd(y2)
    rw = jnp.maximum(rx2 - rx1 + 1, 1)
    rh = jnp.maximum(ry2 - ry1 + 1, 1)
    vals = [rx1, rw]
    vals += [jnp.clip((ph * rh) // p + ry1, 0, h_lim) for ph in range(p)]
    vals += [
        jnp.clip(-((-(ph + 1) * rh) // p) + ry1, 0, h_lim) for ph in range(p)
    ]
    return vals


def _pack_words(vals):
    """Pack an int32 value list into int16 pairs ([..., ceil(len/2)] int32).
    Values are clipped to int16 range — only boxes thousands of px outside
    the feature map would hit the clip, and their edges clamp to empty bins
    either way."""
    if len(vals) % 2:
        vals = vals + [jnp.zeros_like(vals[0])]
    words = [
        (jnp.clip(a, -32768, 32767) & 0xFFFF)
        | (jnp.clip(b, -32768, 32767) << 16)
        for a, b in zip(vals[0::2], vals[1::2])
    ]
    return jnp.stack(words, axis=-1)


def _unpack_words(load, base, n):
    """Kernel-side unpack of ``_pack_words``: 1 scalar SMEM load + 2
    arithmetic shifts per value pair. ``load`` maps a word index to the
    int32 word (prefetched table or DMA'd per-image SMEM slab)."""
    vals = []
    for k in range((n + 1) // 2):
        w_ = load(base + k)
        vals.append((w_ << 16) >> 16)  # sign-extends
        vals.append(w_ >> 16)
    return vals[:n]


def _pack_region_meta(rois, spatial_scale, p, h_lim):
    """XLA-side (vectorized) plain-pool region metadata, packed into int16
    pairs for SMEM scalar prefetch: ``[..., W]`` int32 with value order
    ``rx1, rw, hlo[0..p), hhi[0..p)`` (zero-padded to an even count).

    The per-ROI scalar-core float math this replaces (4 round-to-ints + 2p
    clipped floor-div edges, ~90 serialized ops) measured ~33 ms across the
    B8 x 5024 x 2048ch bench sweep; here it's ~20 elementwise ops on a
    [B, N] array, fused into the ROI-table prep."""
    x1, y1, x2, y2 = (rois[..., i] for i in range(4))
    return _pack_words(
        _region_meta_vals(x1, y1, x2, y2, spatial_scale, p, h_lim)
    )


def _loop_meta_words(p: int) -> int:
    """int32 word count of the packed per-ROI ROILoopPool meta: two regions
    (ROI + outer) plus the 8 hole/row-condition edges."""
    return (4 * p + 12 + 1) // 2


def _pack_loop_meta(rois, spatial_scale, p, h_lim, w_lim, context_ratio):
    """XLA-side ROILoopPool geometry (reference ROILoopPool_cuda.cu
    semantics: clipped inner/outer boxes, unclipped ROI hole), packed for
    SMEM scalar prefetch. Value order: region R ``[rx1, rw, hlo*p, hhi*p]``,
    region O (outer) same, then ``ixa, ixb, rxa, rxb, iya, iyb, rya, ryb``."""
    x1, y1, x2, y2 = (rois[..., i] for i in range(4))
    img_h = h_lim / spatial_scale
    img_w = w_lim / spatial_scale

    def rnd(v):
        return jnp.floor(v * spatial_scale + 0.5).astype(jnp.int32)

    rw_f = x2 - x1
    rh_f = y2 - y1
    in_dw = (rw_f - rw_f / context_ratio) * 0.5
    in_dh = (rh_f - rh_f / context_ratio) * 0.5
    out_dw = (rw_f * context_ratio - rw_f) * 0.5
    out_dh = (rh_f * context_ratio - rh_f) * 0.5
    ixa = rnd(jnp.clip(x1 + in_dw, 0.0, img_w))
    iya = rnd(jnp.clip(y1 + in_dh, 0.0, img_h))
    ixb = rnd(jnp.clip(x2 - in_dw, 0.0, img_w))
    iyb = rnd(jnp.clip(y2 - in_dh, 0.0, img_h))
    rxa, rya, rxb, ryb = rnd(x1), rnd(y1), rnd(x2), rnd(y2)
    xo1 = jnp.clip(x1 - out_dw, 0.0, img_w)
    yo1 = jnp.clip(y1 - out_dh, 0.0, img_h)
    xo2 = jnp.clip(x2 + out_dw, 0.0, img_w)
    yo2 = jnp.clip(y2 + out_dh, 0.0, img_h)
    vals = _region_meta_vals(x1, y1, x2, y2, spatial_scale, p, h_lim)
    vals += _region_meta_vals(xo1, yo1, xo2, yo2, spatial_scale, p, h_lim)
    vals += [ixa, ixb, rxa, rxb, iya, iyb, rya, ryb]
    return _pack_words(vals)


def _unpack_region_meta(load, base, p, w_lim):
    """Kernel-side unpack of ``_pack_region_meta``'s words for one ROI:
    2 scalar SMEM loads + 2 shifts per value pair instead of the serialized
    float math of ``_region_meta``."""
    vals = _unpack_words(load, base, 2 + 2 * p)
    return _region_vals_to_meta(vals, p, w_lim)


def _region_vals_to_meta(vals, p, w_lim):
    rx1, rw = vals[0], vals[1]
    hlo = vals[2 : 2 + p]
    hhi = vals[2 + p : 2 + 2 * p]
    return rx1, rw, hlo, hhi, functools.partial(_w_edges, rx1, rw, p, w_lim)


def _build_h4(full_buf, l2_buf, h):
    """Build the stride-1 H-direction 4-row range-max pyramid level:
    ``l2[h] = max(rows h..h+3)`` (clamped at the bottom edge), shared by
    every ROI of the (image, c-tile) sweep. Two in-place passes: 2-row
    maxes, then a +2 fold (ascending h reads pre-pass-2 values — correct).
    Cost: ~3 tile passes once per resident-tile refresh, amortized over
    the ~5k ROIs that read it.

    int8 tiles (tile8): Mosaic has no int8 vector max, so the build maxes
    in bf16 and re-narrows — exact for int8-range integers (bf16 holds
    +-127 exactly), and amortized like the rest of the build."""
    if full_buf.dtype == jnp.int8:
        def mx(a, b):
            return jnp.maximum(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
            ).astype(jnp.int8)
    else:
        mx = jnp.maximum

    def p1(i, _):
        l2_buf[0, i] = mx(
            full_buf[0, i], full_buf[0, jnp.minimum(i + 1, h - 1)]
        )
        return 0

    jax.lax.fori_loop(0, h, p1, 0, unroll=False)

    def p2(i, _):
        l2_buf[0, i] = mx(
            l2_buf[0, i], l2_buf[0, jnp.minimum(i + 2, h - 1)]
        )
        return 0

    jax.lax.fori_loop(0, h, p2, 0, unroll=False)


def _fold_rows_carry_h4(full_buf, l2_buf, band, hlo, hhi, x0, win, p,
                        c_tile):
    """Stage A via the shared H-direction 4-row pyramid: a bin with
    ``n >= 4`` rows folds ``ceil(n/4)`` stride-4 ``l2`` loads (last clamped
    to ``hhi - 4``; every window [h, h+4) stays inside the bin — exact);
    shorter bins walk their <= 3 raw rows. The walk is VMEM-bandwidth-bound
    (~26 ns per [48, 512] row, ~87 ns at [136, 512] — measured 2026-08-20),
    so tall wide-path bins cut their stage-A bytes ~3.5x. Branchless: the
    two fori trip counts select the path (0-trip loops are free).

    When ``full_buf`` is int8 (tile8 feature tiles) the rows widen to the
    band dtype on load: the walk moves HALF the VMEM bytes (the load port
    is the bound) and the max still runs on the proven bf16 path."""
    neg = _neg_for(band.dtype)
    widen = full_buf.dtype != band.dtype
    full_row = win == full_buf.shape[2]

    def load(buf, hh):
        r = buf[0, hh] if full_row else buf[0, hh, pl.ds(x0, win)]
        return r.astype(band.dtype) if widen else r

    for ph in range(p):
        n = hhi[ph] - hlo[ph]
        t0 = jnp.where(n >= 4, 0, jnp.maximum(n, 0))
        t2 = jnp.where(n >= 4, (n + 3) // 4, 0)

        def body0(t, acc, ph=ph):
            return jnp.maximum(acc, load(full_buf, hlo[ph] + t))

        def body2(t, acc, ph=ph, n=n):
            hh = jnp.minimum(hlo[ph] + 4 * t, jnp.maximum(hhi[ph] - 4, 0))
            return jnp.maximum(acc, load(l2_buf, hh))

        init = jnp.full((win, c_tile), neg, band.dtype)
        acc = jax.lax.fori_loop(0, t0, body0, init, unroll=False)
        acc = jax.lax.fori_loop(0, t2, body2, acc, unroll=False)
        band[ph, :win] = acc


def _fold_rows_carry_sl2(full_buf, band, hlo, hhi, x0, win, p, c_tile):
    """Stage A carry fold processing TWO rows per ``fori`` trip: halves the
    per-trip overhead (scalar bounds/branch/address work — measured ~0.39 us
    per [136, 512] row at ~10% VPU efficiency, i.e. overhead-bound) for the
    tall walks of the wide path. Odd row counts fold the last row under a
    single ``pl.when`` epilogue. Bit-exact vs the 1-row fold (max is
    associative/commutative)."""
    neg = _neg_for(band.dtype)
    widen = full_buf.dtype != band.dtype
    full_row = win == full_buf.shape[2]

    def load(h):
        r = full_buf[0, h] if full_row else full_buf[0, h, pl.ds(x0, win)]
        return r.astype(band.dtype) if widen else r

    for ph in range(p):
        n_rows = hhi[ph] - hlo[ph]

        def body(t, acc, ph=ph):
            h = hlo[ph] + 2 * t
            return jnp.maximum(acc, jnp.maximum(load(h), load(h + 1)))

        init = jnp.full((win, c_tile), neg, band.dtype)
        acc = jax.lax.fori_loop(0, n_rows // 2, body, init, unroll=False)
        band[ph, :win] = acc

        @pl.when(n_rows % 2 == 1)
        def _(ph=ph):
            band[ph, :win] = jnp.maximum(
                band[ph, :win], load(jnp.maximum(hhi[ph] - 1, 0))
            )


def _fold_rows_carry(full_buf, band, hlo, hhi, x0, win, p, c_tile,
                     n_unroll=None):
    """Stage A (narrow path): per-bin row fold with the running max as the
    ``fori`` CARRY — a [win, CT] bf16 value small enough for Mosaic to keep
    in vector registers, so each row costs ONE VMEM slab read instead of the
    read-modify-write triple of the in-place ``band[ph] = max(band[ph],
    row)`` form. Band is written once per bin (empty bins get the NEG init,
    matching the in-place path's semantics).

    ``n_unroll``: STATIC per-bin row cap — replaces the dynamic-trip fori
    with a fully unrolled masked fold (``h = hlo + r`` clamped, masked by
    ``h < hhi``). Correct only when every bin has <= n_unroll rows, i.e.
    rh <= (n_unroll - 1) * p; callers with value-thresholded height splits
    use it to eliminate the per-bin dynamic-loop overhead entirely."""
    neg = _neg_for(band.dtype)
    widen = full_buf.dtype != band.dtype
    h_cap = full_buf.shape[1] - 1
    full_row = win == full_buf.shape[2]

    def load(h):
        # full-row bands skip the dynamic-sublane-offset slice entirely
        r = full_buf[0, h] if full_row else full_buf[0, h, pl.ds(x0, win)]
        return r.astype(band.dtype) if widen else r

    for ph in range(p):
        init = jnp.full((win, c_tile), neg, band.dtype)
        if n_unroll is not None:
            acc = init
            for r in range(n_unroll):
                h = jnp.minimum(hlo[ph] + r, h_cap)
                acc = jnp.where(
                    hlo[ph] + r < hhi[ph], jnp.maximum(acc, load(h)), acc
                )
            band[ph, :win] = acc
            continue

        def body(h, acc):
            return jnp.maximum(acc, load(h))

        band[ph, :win] = jax.lax.fori_loop(
            hlo[ph], hhi[ph], body, init, unroll=False
        )


def _fold_rows_interleaved(full_buf, band, hlo, hhi, x0, win, p, c_tile,
                           branchless=False):
    """Stage A with the p bins' row walks INTERLEAVED: one ``fori`` over
    ``t = 0..max_bin_height``, each trip folding row ``hlo[ph] + t`` of
    every bin. The p per-bin load->max chains are independent, so the
    per-trip VMEM-load serialization of the sequential per-bin walk
    (~0.7 us per row measured on v5e, CONSTANT across band widths 48..136)
    can overlap p-ways. ROIPool bin heights are equal within +-1
    (floor/ceil integer edges), so total row loads stay ~rh + p.
    In-place band fold (read-modify-write) — the acc-carry form would hold
    p*[win, CT] in registers and spill.

    ``branchless``: instead of predicating each bin's fold on
    ``t < hhi - hlo`` (a scalar branch per bin per trip — measured to eat
    the entire interleaving win), CLAMP the row index to ``hhi - 1`` and
    re-max (idempotent); bins that are empty altogether are reset to NEG
    by a per-bin epilogue."""
    neg = _neg_for(band.dtype)
    widen = full_buf.dtype != band.dtype
    band[:, :win] = jnp.full((p, win, c_tile), neg, band.dtype)
    max_h = hhi[0] - hlo[0]
    for ph in range(1, p):
        max_h = jnp.maximum(max_h, hhi[ph] - hlo[ph])
    full_row = win == full_buf.shape[2]

    def load(h):
        r = full_buf[0, h] if full_row else full_buf[0, h, pl.ds(x0, win)]
        return r.astype(band.dtype) if widen else r

    if branchless:
        def body(t, _):
            for ph in range(p):
                h = jnp.minimum(hlo[ph] + t, jnp.maximum(hhi[ph] - 1, 0))
                band[ph, :win] = jnp.maximum(band[ph, :win], load(h))
            return 0

        jax.lax.fori_loop(0, max_h, body, 0, unroll=False)
        for ph in range(p):
            @pl.when(hhi[ph] <= hlo[ph])
            def _(ph=ph):
                band[ph, :win] = jnp.full((win, c_tile), neg, band.dtype)
        return

    def body(t, _):
        for ph in range(p):
            h = hlo[ph] + t

            @pl.when(h < hhi[ph])
            def _(ph=ph, h=h):
                band[ph, :win] = jnp.maximum(band[ph, :win], load(h))

        return 0

    jax.lax.fori_loop(0, max_h, body, 0, unroll=False)


def _fold_rows_carry_pair(
    full_buf, band_a, band_b, hlo, hhi, x0, win, p, c_tile, row_cond
):
    """Loop-pool stage A (narrow path): one pass over each bin's rows with
    the unconditional band as the ``fori`` CARRY (one slab read per row, no
    read-modify-write) and the conditional band folded in place under
    ``row_cond`` sharing the same row load. ``band_b`` must be
    NEG-initialised by the caller; ``band_a`` is written once per bin."""
    neg = _neg_for(band_a.dtype)
    widen = full_buf.dtype != band_a.dtype
    for ph in range(p):
        def body(h, acc, ph=ph):
            row = full_buf[0, h, pl.ds(x0, win)]
            if widen:
                row = row.astype(band_a.dtype)

            @pl.when(row_cond(h))
            def _():
                band_b[ph, :win] = jnp.maximum(band_b[ph, :win], row)

            return jnp.maximum(acc, row)

        init = jnp.full((win, c_tile), neg, band_a.dtype)
        band_a[ph, :win] = jax.lax.fori_loop(
            hlo[ph], hhi[ph], body, init, unroll=False
        )


def _fold_rows(full_buf, band, band2, hlo, hhi, x0, wd, win, p, row_cond=None):
    """Stage A: walk each bin's feature rows once, folding row ``[wd, CT]``
    maxes into ``band[ph, :wd]``; if ``band2``/``row_cond`` are given, also
    fold rows satisfying ``row_cond(h)`` into ``band2[ph, :wd]`` (shared
    loads). ``win`` selects the windowed (dynamic 8-aligned ``x0``) or
    full-row load path; ``wd`` is the static band width.

    (4-row slab folds and per-ROI window-class branches were both measured
    SLOWER on v5e — Mosaic pipelines the simple row walk better than either;
    see scripts/bench_maxpool_kernel.py history.)"""
    widen = full_buf.dtype != band.dtype
    for ph in range(p):
        def body(h, _, ph=ph):
            if win is None:
                row = full_buf[0, h]
            else:
                row = full_buf[0, h, pl.ds(x0, win)]
            if widen:
                row = row.astype(band.dtype)
            band[ph, :wd] = jnp.maximum(band[ph, :wd], row)
            if band2 is not None:
                @pl.when(row_cond(h))
                def _():
                    band2[ph, :wd] = jnp.maximum(band2[ph, :wd], row)
            return 0

        jax.lax.fori_loop(hlo[ph], hhi[ph], body, 0, unroll=False)


def _onehot_gather_max(band, wd, x0, rx1, rw, w_lim, p, j_cap, c_tile, dtype):
    """Stage B via MXU one-hot gathers (narrow path; bin width <= ``j_cap``).

    Builds one [p*j_cap, wd] one-hot matrix whose row ``pw*j_cap + j``
    selects band column ``wlo[pw] - x0 + j`` (zero row when ``wlo+j >=
    whi``), then per output row ``ph`` gathers candidate columns with ONE
    dot ``[K, wd] x [wd, CT]`` and reduces the j-groups with a masked max.
    The dot is an exact gather: each row has at most one 1.0, so the f32
    accumulation reproduces the selected value bit-exactly (bf16 or f32
    features). Empty bins (vertically or horizontally) come out as ``NEG``
    and are zeroed by the caller's empty-bin epilogue.

    The per-bin w edges are computed VECTORIZED here from the scalar
    ``rx1``/``rw`` (same floor/ceil integer formulas as
    ``_region_meta.w_edges`` — jnp ``//`` is floor division like Python's):
    two cheap scalar->vector broadcasts replace 14 serialized scalar-core
    edge computations per region.

    Replaces the 49 masked full-band maxes of ``_band_max`` — ~6x less VPU
    work, with the gather riding the otherwise-idle MXU.
    """
    vals, valid, _ = _onehot_candidates(
        band, wd, x0, rx1, rw, w_lim, p, j_cap, c_tile, dtype
    )
    return _jgroup_max(vals, valid, p, j_cap, c_tile)


def _onehot_candidates(band, wd, x0, rx1, rw, w_lim, p, j_cap, c_tile, dtype):
    """Shared first half of the MXU stage B: build the bin one-hot for the
    region ``(rx1, rw)`` and gather every candidate column of ``band`` with
    one dot per output row. Returns ``(vals, valid, tabs)``: ``vals[ph]``
    is the [p*j_cap, CT] f32 candidate matrix, ``valid`` the in-bin row
    mask, and ``tabs`` each candidate's ABSOLUTE feature column (for hole
    masks).
    Splitting the gather from the reduce lets ROILoopPool's five region
    variants share two dot sets instead of running five masked band maxes.
    """
    k = p * j_cap
    r_i = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    jj = r_i % j_cap
    pwv = r_i // j_cap
    wlo_v = jnp.clip((pwv * rw) // p + rx1, 0, w_lim)
    whi_v = jnp.clip(-((-(pwv + 1) * rw) // p) + rx1, 0, w_lim)
    tabs = wlo_v + jj
    valid = tabs < whi_v
    ciota = jax.lax.broadcasted_iota(jnp.int32, (k, wd), 1)
    onehot = jnp.where(
        jnp.logical_and(ciota == tabs - x0, valid), 1.0, 0.0
    ).astype(dtype)
    # f32 features need HIGHEST precision or the MXU's default bf16 input
    # truncation breaks the bit-exact-gather contract (bf16 features are
    # unaffected and keep the fast default passes). int8 (tile8 walk) rides
    # the 2x int8 MXU rate with an int32 accumulator — still an exact gather.
    # (a bf16 accumulator would also be exact for gathers — one nonzero per
    # output — but Mosaic REQUIRES 32-bit matmul accumulators: 'tpu.matmul
    # op Expected matmul acc to be 32-bit', measured 2026-08-19.)
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    acc_t = jnp.int32 if jnp.dtype(dtype) == jnp.int8 else jnp.float32
    vals = [
        jax.lax.dot_general(
            onehot,
            band[ph, :wd],
            (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t,
            precision=prec,
        )
        for ph in range(p)
    ]
    return vals, valid, tabs


def _onehot_candidates_bd(band, wd, x0, rx1, rw, w_lim, p, j_cap, c_tile,
                          dtype):
    """Stage B candidate gather as ONE block-diagonal dot (vs the 7
    per-``ph`` dots of ``_onehot_candidates``, which run at ~3% MXU
    efficiency — per-dot fill/drain dominated, measured ~67 ms of the
    183 ms bench sweep). The band ``[p, wd, CT]`` reshapes (free — ``wd``
    is sublane-aligned) into the rhs ``[p*wd, CT]``; the lhs is a
    ``[p*p*j_cap, p*wd]`` one-hot whose row ``ph*(p*j_cap) + pw*j_cap + j``
    selects rhs row ``ph*wd + wlo[pw] - x0 + j`` — i.e. the SAME [k, wd]
    one-hot block repeated down the diagonal, one block per ``ph``. 7x MAC
    waste (67M vs 9.6M per ROI-c-tile at win=48) but a single MXU
    fill/drain. Returns ``(val [p*k, CT] f32, valid [k, 1], tabs [k, 1])``
    with ``valid``/``tabs`` in the per-``ph`` row order (broadcastable over
    the leading ph axis after a reshape to [p, k, CT])."""
    k = p * j_cap
    kb = p * k
    r_i = jax.lax.broadcasted_iota(jnp.int32, (kb, 1), 0)
    within = r_i % k
    jj = within % j_cap
    pwv = within // j_cap
    wlo_v = jnp.clip((pwv * rw) // p + rx1, 0, w_lim)
    whi_v = jnp.clip(-((-(pwv + 1) * rw) // p) + rx1, 0, w_lim)
    tabs = wlo_v + jj
    valid = tabs < whi_v
    ciota = jax.lax.broadcasted_iota(jnp.int32, (kb, p * wd), 1)
    # block-diag: row r (in ph block r//k) hits col ph*wd + (tabs - x0)
    col = (r_i // k) * wd + tabs - x0
    onehot = jnp.where(
        jnp.logical_and(ciota == col, valid), 1.0, 0.0
    ).astype(dtype)
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    acc_t = jnp.int32 if jnp.dtype(dtype) == jnp.int8 else jnp.float32
    rhs = band[:, :wd].reshape(p * wd, c_tile)
    val = jax.lax.dot_general(
        onehot, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=acc_t, precision=prec,
    )  # [p*k, CT]
    return val, valid[:k], tabs[:k]


def _jgroup_max_bd(val, mask, p, j_cap, c_tile):
    """j-group masked max of the block-diag candidate matrix
    ``[p*p*j_cap, CT]`` -> [P, P, CT] f32. ``mask`` is the per-ph-block
    [p*j_cap, 1] validity (tiled over ph by broadcasting)."""
    if val.dtype == jnp.int32:
        neg = jnp.int32(-(2**30))
    else:
        neg = val.dtype.type(NEG)
    k = p * j_cap
    m = jnp.broadcast_to(mask, (k, val.shape[-1]))
    m = jnp.broadcast_to(m[None], (p, k, val.shape[-1])).reshape(p * k, -1)
    out = jnp.max(
        jnp.where(m, val, neg).reshape(p, p, j_cap, c_tile), axis=2
    )
    return out.astype(jnp.float32) if out.dtype != jnp.float32 else out


def _onehot_gather_max_bd(band, wd, x0, rx1, rw, w_lim, p, j_cap, c_tile,
                          dtype):
    """Block-diag single-dot form of ``_onehot_gather_max``."""
    val, valid, _ = _onehot_candidates_bd(
        band, wd, x0, rx1, rw, w_lim, p, j_cap, c_tile, dtype
    )
    return _jgroup_max_bd(val, valid, p, j_cap, c_tile)


def _jgroup_max(vals, mask, p, j_cap, c_tile):
    """Second half: masked max over each bin's j-group -> [P, P, CT] f32.
    int32 candidates (tile8) reduce in int32 and promote only the [P, CT]
    result — exact, int8-range values; the mask fill is below any payload
    and maps under <= NEG/2-style empty detection via <= -127.5."""
    outs = []
    for v in vals:
        if v.dtype == jnp.int32:
            neg = jnp.int32(-(2**30))
        else:
            neg = v.dtype.type(NEG)  # bf16/f32 both represent NEG
        m = jnp.max(
            jnp.where(mask, v, neg).reshape(p, j_cap, c_tile), axis=1
        )
        outs.append(m.astype(jnp.float32) if m.dtype != jnp.float32 else m)
    return jnp.stack(outs, axis=0)


def _onehot_gather_max_pyr(band, wd, rx1, rw, w_lim, p, c_tile, dtype,
                           l_max, ablate=""):
    """Stage B for the WIDE (full-row) path via an in-place range-max
    PYRAMID + 5-span gather — replaces both prior wide forms (VPU
    ``_band_max`` 49 masked full-band maxes and the j_cap~24 gather dots;
    each measured ~890 ms all-wide vs ~175 narrow at the bench shape:
    their cost scales with the per-bin candidate count).

    Level j of the pyramid folds ``band[ph, x] = max(band[ph, x],
    band[ph, x + 2^(j-1)])`` in place, so after running levels 1..k every
    row x <= wd - 2^k holds the max over columns [x, x + 2^k). Each output
    bin's max is then EXACTLY covered by S=5 spans of length 2^k:

    - per-ROI scalar k = floor(log2(max(m - 1, 1))), m = rw // p;
    - unclipped bin widths lie in [m, ceil(rw/p) + 1] (spread <= 2) and
      image-clipping can shrink only the LAST bin by exactly 1 (pre-clipped
      boxes: rx1 >= 0 and rx2 <= w_lim => whi overflows w_lim by at most
      1), so widths lie in [max(m - 1, 1), m + 2] for nonempty bins;
    - validity: 2^k <= m - 1 <= every width (k = 0 handles m <= 2);
    - coverage: 5 spans with starts ``wlo + i*(width - 2^k)//4`` have gaps
      <= ceil((width - 2^k)/4) <= 2^k  <=>  width <= 5*2^k, and
      m + 2 <= 5*2^floor(log2(max(m-1,1))) holds for every m >= 0.

    PRECONDITION: rois are image-clipped (every shipped caller clips;
    un-clipped "monster" boxes whose interior bins straddle the image edge
    can shrink a bin below 2^k — spans are then clamped inside the ROI but
    may read past the bin's right edge, overestimating that bin). The VPU
    ``_band_max`` path (``stage_b_wide='vpu'``) remains the exact form for
    arbitrary boxes.

    The dtype stays the feature dtype through the pyramid (max is
    selection — bit-exact) and the gather dot accumulates f32 (exact: one
    nonzero per row). Returns [p, p, CT] f32; empty bins NEG (caller
    zeroes)."""
    S = 5
    m = rw // p
    km1 = jnp.maximum(m - 1, 1)
    k = jnp.int32(0)
    for j in range(1, l_max + 1):
        k = k + (km1 >= (1 << j)).astype(jnp.int32)
    for lvl in range(1, l_max + 1):
        s = 1 << (lvl - 1)

        @pl.when(lvl <= k)
        def _(s=s):
            for ph in range(p):
                band[ph, : wd - s] = jnp.maximum(
                    band[ph, : wd - s], band[ph, s:wd]
                )

    if ablate == "pyronly":  # measurement: pyramid build, no gather (WRONG)
        return band[:, :p].astype(jnp.float32)
    two_k = jax.lax.shift_left(jnp.int32(1), k)
    kr = p * S
    # Row count must be BOTH sublane-aligned (8) and divisible by the span
    # group S for the j-group reduce's reshape — lcm(8, 5) = 40. Rounding
    # to 8 alone broke every pooled resolution where p*S % 8 != 0 (e.g. the
    # d2-default p=14: 70 -> 72, not reshapable by 5).
    lcm = 8 * S // math.gcd(8, S)
    kr_pad = -(-kr // lcm) * lcm
    r_i = jax.lax.broadcasted_iota(jnp.int32, (kr_pad, 1), 0)
    ii = r_i % S
    pwv = jnp.minimum(r_i // S, p - 1)
    wlo_v = jnp.clip((pwv * rw) // p + rx1, 0, w_lim)
    whi_v = jnp.clip(-((-(pwv + 1) * rw) // p) + rx1, 0, w_lim)
    width = whi_v - wlo_v
    hi = jnp.maximum(whi_v - two_k, wlo_v)
    xs = jnp.clip(wlo_v + (ii * (width - two_k)) // (S - 1), wlo_v, hi)
    valid = jnp.logical_and(width > 0, r_i < kr)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (kr_pad, wd), 1)
    onehot = jnp.where(
        jnp.logical_and(ciota == xs, valid), 1.0, 0.0
    ).astype(dtype)
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    acc_t = jnp.int32 if jnp.dtype(dtype) == jnp.int8 else jnp.float32
    neg = jnp.int32(-(2 ** 30)) if acc_t == jnp.int32 else jnp.float32(NEG)
    outs = []
    for ph in range(p):
        v = jax.lax.dot_general(
            onehot, band[ph, :wd], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t, precision=prec,
        )
        if ablate == "nojg":  # measurement: dots only, no group max (WRONG)
            outs.append(v[:p].astype(jnp.float32))
            continue
        g = jnp.max(
            jnp.where(valid, v, neg).reshape(kr_pad // S, S, c_tile), axis=1
        )[:p]
        outs.append(g.astype(jnp.float32) if g.dtype != jnp.float32 else g)
    return jnp.stack(outs, axis=0)


def _fold_rows_carry_w(full_buf, wband, hlo, hhi, x0, win, p, c_tile):
    """Stage A writing a W-MAJOR band ``[win, 8(ph)*CT]`` (w8hc stage B):
    same carry fold as ``_fold_rows_carry`` but each bin stores its
    ``[win, CT]`` result at LANE BLOCK ph (a contiguous, lane-tile-aligned
    block store — the original ``[win, 8, CT]`` buffer put ph on the
    SUBLANE axis, making every bin store a 1-of-8 masked-sublane write,
    which measured 481 ms vs 175 for the whole sweep). The pad block ph=7
    is never written — the epilogue zeroes its lanes."""
    neg = _neg_for(wband.dtype)
    widen = full_buf.dtype != wband.dtype
    for ph in range(p):
        def body(h, acc):
            row = full_buf[0, h, pl.ds(x0, win)]
            return jnp.maximum(acc, row.astype(wband.dtype) if widen else row)

        init = jnp.full((win, c_tile), neg, wband.dtype)
        wband[:, ph * c_tile:(ph + 1) * c_tile] = jax.lax.fori_loop(
            hlo[ph], hhi[ph], body, init, unroll=False
        )


def _onehot_gather_max_w(wband, win, x0, rx1, rw, w_lim, p, j_cap, c_tile,
                         dtype):
    """w8hc stage B: ONE exact-gather dot per ROI. The w-major band is
    stored directly as the rhs ``[win, 8(ph)*CT]`` (ph = lane blocks); the
    [p*j_cap, win] one-hot then gathers EVERY (pw, j) candidate for ALL ph
    lane-blocks in a single ``[56, win] x [win, 8*CT]`` matmul — vs 7
    small dots at ~3% MXU efficiency (fill/drain bound; measured ~67 ms of
    the 183 ms sweep).
    Returns ``[p(pw), 8*CT]`` f32 (ph in the lane blocks; pad lanes
    ph=7 hold garbage — callers zero them)."""
    k = p * j_cap
    r_i = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    jj = r_i % j_cap
    pwv = r_i // j_cap
    wlo_v = jnp.clip((pwv * rw) // p + rx1, 0, w_lim)
    whi_v = jnp.clip(-((-(pwv + 1) * rw) // p) + rx1, 0, w_lim)
    tabs = wlo_v + jj
    valid = tabs < whi_v
    ciota = jax.lax.broadcasted_iota(jnp.int32, (k, win), 1)
    onehot = jnp.where(
        jnp.logical_and(ciota == tabs - x0, valid), 1.0, 0.0
    ).astype(dtype)
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    rhs = wband[:, :]
    val = jax.lax.dot_general(
        onehot, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # [k, 8*CT]
    masked = jnp.where(valid, val, jnp.float32(NEG))
    return jnp.max(masked.reshape(p, j_cap, 8 * c_tile), axis=1)


def _band_max(band, wd, col, wlo, whi, p, hole_x=None):
    """Stage B: per-bin masked max over the band's x axis -> [P, P, CT].

    ``hole_x=(hx1, hx2)`` additionally restricts columns to the strict
    outside of the hole's column span (``col <= hx1 | col >= hx2``)."""
    bv = band[:, :wd]  # [P, wd, CT]
    if bv.dtype == jnp.int8:
        # Mosaic has no int8 max-reduce; bf16 holds int8 exactly (tile8
        # wide path — rare, the narrow MXU path stays int8)
        bv = bv.astype(jnp.bfloat16)
    neg = _neg_for(bv.dtype)
    outs = []
    for pw in range(p):
        m = jnp.logical_and(col >= wlo[pw], col < whi[pw])  # [wd, 1]
        if hole_x is not None:
            m = jnp.logical_and(
                m, jnp.logical_or(col <= hole_x[0], col >= hole_x[1])
            )
        masked = jnp.where(m[None], bv, neg)
        outs.append(jnp.max(masked, axis=1))  # [P(ph), CT]
    return jnp.stack(outs, axis=1)  # [P(ph), P(pw), CT]


def _write_out(out_ref, scale_ref, regions, gate, i, ri, quant, nmajor=False,
               n56c=False):
    """Epilogue: gate-and-write (bf16), quantize-and-write (int8), or
    gate-and-write + per-lane maxabs partial row ("maxabs": the downstream
    XLA int8-quantize pass then reads the chunk ONCE — its separate
    full-chunk maxabs reduce pass collapses to a [CT]-per-ROI reduce of
    these partials).

    ``regions``: list of [P, P, CT] pooled values (pre-gate). For int8 the
    gate folds into the emitted scale, keeping the payload gate-free.
    ``ri`` is this ROI's index within the full padded N axis (the scales
    block spans all of N_pad — small last dims can't be tiled).
    ``nmajor`` stores into the n-major ``[(3,) 1, RB, P, P, CT]`` block
    instead of the hwnc ``[(3,) 1, P, P, RB, CT]`` one; ``n56c`` maps
    (ph, pw) -> row ph*8 + pw (pw zero-padded to 8), so each ROI's store is
    a CONTIGUOUS [p*8, CT] full-tile write at ``out_ref[(r,) 0, i]`` — the
    hwnc per-ROI store masks 1 of 8 sublanes across 49 tiles (read-modify-
    write), measured ~98 ms of the 183 ms bench sweep on v5e."""
    triple = len(regions) > 1

    def store(r, payload):
        if n56c:
            # row = ph*8 + pw (pw padded 7 -> 8 with zeros): padding the
            # SUBLANE dim to 8 first makes the (p, 8) -> p*8 merge a free
            # relayout — reshaping (7, 7) -> 49 directly costs an in-
            # register sublane shuffle that ate the store saving (201 vs
            # 183 ms measured)
            p_, _, ct_ = payload.shape
            flat = jnp.pad(payload, ((0, 0), (0, 8 - p_), (0, 0))).reshape(
                p_ * 8, ct_
            )
            if triple:
                out_ref[r, 0, i] = flat
            else:
                out_ref[0, i] = flat
            return
        if triple:
            if nmajor:
                out_ref[r, 0, i] = payload
            else:
                out_ref[r, 0, :, :, i] = payload
        elif nmajor:
            out_ref[0, i] = payload
        else:
            out_ref[0, :, :, i] = payload

    if quant == "maxabs":
        for r, vals in enumerate(regions):
            gated = (vals.astype(jnp.float32) * gate).astype(out_ref.dtype)
            # partial from the ROUNDED payload so the precomputed scale is
            # bit-identical to an XLA maxabs over the emitted chunk; stored
            # as a [1, CT] row (rank-2 keeps Mosaic's store path happy)
            part = jnp.max(
                jnp.abs(gated.astype(jnp.float32)), axis=(0, 1), keepdims=True
            )[0]  # [1, CT]
            store(r, gated)
            if triple:
                scale_ref[r, 0, 0, pl.ds(i, 1)] = part
            else:
                scale_ref[0, 0, pl.ds(i, 1)] = part
        return
    if quant == "tile8":
        # tile8: values are already quantized ints (the max of an int8-
        # quantized tile IS the quantized max — monotone), so emission is a
        # cast; the per-ROI scale is the prefetched gate, into which the
        # caller folded the per-(image, chunk) feature scale.
        for r, vals in enumerate(regions):
            store(r, jnp.clip(vals, -127.0, 127.0).astype(jnp.int8))
            if triple:
                scale_ref[r, 0, 0, ri] = gate
            else:
                scale_ref[0, 0, ri] = gate
        return
    if quant == "int8":
        for r, vals in enumerate(regions):
            v32 = vals.astype(jnp.float32)
            # the quant multiply uses a [1, 1] VECTOR inv so the value never
            # round-trips through a scalar register: scalar->vector
            # broadcast of the reduced maxabs costs ~44 ms across the bench
            # sweep (measured v5e); only the SMEM scale store extracts it
            m_v = jnp.max(jnp.max(jnp.abs(v32), axis=0), axis=0, keepdims=True)
            m_v = jnp.max(m_v, axis=1, keepdims=True)  # [1, 1]
            inv_v = jnp.where(m_v > 1e-20, 127.0 / m_v, 0.0)
            q = jnp.round(v32 * inv_v[None]).astype(jnp.int8)
            maxabs = m_v[0, 0]
            store(r, q)
            if triple:
                scale_ref[r, 0, 0, ri] = gate * maxabs * (1.0 / 127.0)
            else:
                scale_ref[0, 0, ri] = gate * maxabs * (1.0 / 127.0)
    else:
        for r, vals in enumerate(regions):
            store(r, (vals.astype(jnp.float32) * gate).astype(out_ref.dtype))


def _fused_pool_kernel(
    rois_ref,  # packed per-ROI geometry (_pack_region_meta / _pack_loop_meta
    #           words): [B*N_pad*W] prefetched SMEM, or [1, row_w] SMEM
    #           scratch holding the CURRENT image's words (meta_dma mode)
    gate_ref,  # per-ROI gate: [B*N_pad] f32 SMEM, or [1, g_row] scratch
    cbase_ref,  # [1] SMEM channel base of this chunk
    src_ref,  # [B*(N_pad//RB)] SMEM per-block feat dim-0 DMA source (MRRP
    #           branch routing: blocks are branch-pure, table = br*B + b;
    #           without routing the table is constant b)
    cls_ref,  # [B*(N_pad//RB)] SMEM per-block width class (class-sorted
    #           plain pool; None = per-ROI narrow/wide)
    feat_hbm,  # [B or n_br*B, H, W_dma, C] ANY/HBM
    out_ref,  # [(3,) 1, P, P, RB, CT] VMEM
    scale_ref,  # [(3,) 1, 1, RB] VMEM (quant) or None-like dummy
    full_buf,  # [1, H, W_dma, CT] VMEM resident tile
    l2_buf,  # [1, H, W_dma, CT] shared H-direction 4-row range-max pyramid
    #         (hpyr mode) or None
    band_a2,  # [2, P, W_band, CT] feat-dtype scratch, DOUBLE-buffered: ROI
    #          i uses slot i&1 so ROI i+1's stage-A VPU walk has no
    #          write-after-read hazard against ROI i's stage-B MXU gathers —
    #          the single-band WAR chain serialized the whole per-ROI body
    band_b2,  # same (loop pool only) or None
    wband_buf,  # [win, 8, CT] w-major band (w8hc stage B only) or None
    sem,
    *,
    p: int,
    spatial_scale: float,
    roi_block: int,
    n_pad: int,
    h_lim: int,
    w_lim: int,
    w_dma: int,
    c_tile: int,
    win: int,
    narrow_enabled: bool,
    loop_pool: bool,
    context_ratio: float,
    quant: str,
    cls_wins=(),  # ((w_sl, j_cap), ...) per class id; w_sl None = wide
    loop_merged: bool = False,  # loop pool: a/b bands as lane-block halves
    # of one [p, w, 2CT] buffer -> 14 gather dots + 3 j-group passes per
    # ROI instead of 28 + 5 (band_b2 is then unused/None)
    loop_wide: str = "dots",  # loop wide body: "dots" = full-row gather
    # dots at jc_wide (compact; exact for boxes within ~2x the image) |
    # "vpu" = the masked-band-max body (exact for ANY box, but its
    # coexistence taxes every narrow ROI ~3.9 us/visit)
    nmajor: bool = False,
    n56c: bool = False,
    w8hc: bool = False,
    meta_dma: bool = False,
    force_narrow: bool = False,
    pipe: bool = False,  # force_narrow windowed loop: software-pipeline the
    # 8-ROI block as A(0); {A(i+1); B(i); store(i)} so ROI i's stage-B MXU
    # dots sit between independent stage-A VPU walks in program order —
    # gives Mosaic's scheduler the chance to co-issue the two units (the
    # bands are already double-buffered, so there is no data hazard)
    row_unroll=None,  # static per-bin row cap (narrow plain path)
    hpyr: bool = False,  # stage A reads the shared 4-row H-pyramid for
    # bins >= 4 rows (see _fold_rows_carry_h4); l2_buf must be provided
    stage_b: str = "dots",  # "dots" (7 per-ph gathers) | "bd" (block-diag)
    stage_b_wide: str = "pyr",  # wide full-row stage B: "pyr" = range-max
    # pyramid + 5-span gather (see _onehot_gather_max_pyr; requires
    # image-clipped rois) | "vpu" = the exact-for-any-box _band_max
    l_max: int = 5,  # static pyramid depth (from w_dma at the entry)
    fold: str = "seq",  # stage A row walk: "seq" per-bin carry | "il"
    # p-way interleaved in-place | "il2" interleaved + branchless clamped
    # re-max (see _fold_rows_interleaved) | "sl2" 2-row slab carry
    # (_fold_rows_carry_sl2: halves the overhead-bound per-trip cost)
    wide_dot: bool = False,  # wide ROIs: full-row MXU gather stage B as a
    # 3rd per-ROI pl.when body — MEASURED DEAD (mixed 703 vs 319 ms, and
    # merely TRACING the extra body slowed all-narrow 183 -> 639: per-ROI
    # bodies poison the whole program). Kept for documentation; the
    # shipping wide-ROI fix is the width-split wide SEGMENT (win=w_dma +
    # force_narrow — a separate single-body program).
    ablate: str = "",  # measurement-only: "nodot" | "nojg" | "cheapstore"
):
    b = pl.program_id(0)
    ct_i = pl.program_id(1)
    rbi = pl.program_id(2)
    c0 = pl.multiple_of(cbase_ref[0] + ct_i * c_tile, 128)

    # Per-load scalar arithmetic is THE kernel bottleneck (the round-3
    # prefetch win was exactly removing per-ROI scalar work; re-deriving the
    # batch offset inside every load measured 2x pool-only, 92 -> 184 ms on
    # v5e). The loads below therefore take a PRE-COMPUTED absolute index:
    # the batch offset is hoisted once per kernel here, and the per-ROI base
    # once per ROI in the bodies.
    mw = _loop_meta_words(p) if loop_pool else _meta_words(p)
    if meta_dma:
        # per-image tables already DMA'd into the SMEM scratch slabs; the
        # slabs are [row/128, 128] (the 128-column shape keeps the HBM
        # source's sliced batch dim untiled — Mosaic rejects 1-row slices
        # of (8, 128)-tiled 2-D arrays)
        moff = 0
        goff = 0
        load_m = lambda i: rois_ref[i >> 7, i & 127]
        load_g = lambda i: gate_ref[i >> 7, i & 127]
    else:
        moff = b * (n_pad * mw)
        goff = b * n_pad
        load_m = lambda i: rois_ref[i]
        load_g = lambda i: gate_ref[i]

    n_blocks = n_pad // roi_block
    src = src_ref[b * n_blocks + rbi]
    # refresh the resident tile at the sweep start and whenever the block's
    # DMA source changes (branch-sorted MRRP blocks: <= n_br refreshes per
    # (image, c-tile) sweep)
    stale = jnp.logical_or(
        rbi == 0, src != src_ref[b * n_blocks + jnp.maximum(rbi - 1, 0)]
    )

    @pl.when(stale)
    def _():
        cp = pltpu.make_async_copy(
            feat_hbm.at[pl.ds(src, 1), :, :, pl.ds(c0, c_tile)], full_buf, sem
        )
        cp.start()
        cp.wait()
        if hpyr:
            _build_h4(full_buf, l2_buf, full_buf.shape[1])

    # bands hold the (possibly widened) walk values: int8 feature tiles
    # (tile8) walk half the VMEM bytes and widen to bf16 bands on load
    band_dt = band_a2.dtype
    neg = _neg_for(band_dt)
    # tile8 payloads are int8-range with -128/NEG empty fills, so -127.5
    # separates empties exactly; float walks use the NEG sentinel
    empty_thr = (
        -127.5
        if jnp.int8 in (full_buf.dtype, band_dt)
        else NEG / 2
    )

    if not loop_pool:
        def plain_body(i, w_sl, j_cap):
            """One ROI at a STATIC window class: ``w_sl`` px x-window with
            ``j_cap`` one-hot candidates per bin; the full-row MXU path
            (``w_sl=None, j_cap`` set — stage A carry-folds the whole row,
            stage B gather-dots with a width-sized candidate budget); or
            the full-row VPU path (``w_sl=None, j_cap=None`` — masked band
            maxes, the only exact form for bins wider than any static
            ``j_cap``, i.e. unclipped monster ROIs). Region metadata is
            precomputed vectorized in XLA (_pack_region_meta) and
            prefetched: the kernel's per-ROI scalar work drops to W SMEM
            loads + 2W shifts per c-tile."""
            ri = rbi * roi_block + i
            band_a = band_a2.at[i % 2]
            gate = load_g(goff + ri)
            rx1, rw, hlo, hhi, w_edges = _unpack_region_meta(
                load_m, moff + ri * mw, p, w_lim
            )
            wd = w_sl or w_dma
            if w8hc and w_sl is not None:
                x0 = jnp.clip(rx1, 0, w_dma - w_sl)
                x0 = pl.multiple_of((x0 // 8) * 8, 8)
                _fold_rows_carry_w(
                    full_buf, wband_buf, hlo, hhi, x0, w_sl, p, c_tile
                )
                pooled_w = _onehot_gather_max_w(
                    wband_buf, w_sl, x0, rx1, rw, w_lim, p, j_cap, c_tile,
                    band_dt,
                )  # [p(pw), 8*CT]
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (p, 8 * c_tile), 1
                )
                # empty bins AND the ph=7 pad lane block -> 0
                pooled_w = jnp.where(
                    jnp.logical_or(pooled_w <= NEG / 2, lane >= p * c_tile),
                    0.0,
                    pooled_w,
                )
                payload = jnp.pad(
                    (pooled_w * gate).astype(out_ref.dtype),
                    ((0, 8 - p), (0, 0)),
                )
                out_ref[0, i] = payload
                return
            if w_sl is not None:
                x0 = jnp.clip(rx1, 0, w_dma - w_sl)
                x0 = pl.multiple_of((x0 // 8) * 8, 8)
                if hpyr:
                    _fold_rows_carry_h4(
                        full_buf, l2_buf, band_a, hlo, hhi, x0, w_sl, p,
                        c_tile,
                    )
                elif fold in ("il", "il2"):
                    _fold_rows_interleaved(
                        full_buf, band_a, hlo, hhi, x0, w_sl, p, c_tile,
                        branchless=(fold == "il2"),
                    )
                elif fold == "sl2":
                    _fold_rows_carry_sl2(
                        full_buf, band_a, hlo, hhi, x0, w_sl, p, c_tile
                    )
                else:
                    _fold_rows_carry(
                        full_buf, band_a, hlo, hhi, x0, w_sl, p, c_tile,
                        n_unroll=row_unroll,
                    )
                if ablate == "nodot":
                    # measurement: stage A + epilogue only (WRONG results)
                    pooled = band_a[:, :p].astype(jnp.float32)
                elif ablate == "nojg":
                    vals, _, _ = _onehot_candidates(
                        band_a, wd, x0, rx1, rw, w_lim, p, j_cap, c_tile,
                        band_dt,
                    )
                    pooled = jnp.stack(
                        [v[:p].astype(jnp.float32) for v in vals]
                    )
                elif stage_b == "bd":
                    pooled = _onehot_gather_max_bd(
                        band_a, wd, x0, rx1, rw, w_lim, p, j_cap, c_tile,
                        band_dt,
                    )
                else:
                    # narrow ROI (bin width <= (w_sl-7)//p + 1 <= j_cap):
                    # MXU path
                    pooled = _onehot_gather_max(
                        band_a, wd, x0, rx1, rw, w_lim, p, j_cap, c_tile,
                        band_dt,
                    )
            elif j_cap is not None:
                # full-row MXU path: wide-but-clipped ROIs (rw <= 7*(j_cap
                # - 1)). Stage B via the same exact gather dots as the
                # narrow path — the VPU _band_max alternative costs ~23k
                # vreg-ops per ROI-c-tile at wd=136 (~21 us measured, ~80
                # ms/batch at the honest 19%-wide COCO mix) vs ~3-6 us of
                # MXU dots.
                x0 = jnp.int32(0)
                if hpyr:
                    _fold_rows_carry_h4(
                        full_buf, l2_buf, band_a, hlo, hhi, x0, wd, p,
                        c_tile,
                    )
                elif fold in ("il", "il2"):
                    _fold_rows_interleaved(
                        full_buf, band_a, hlo, hhi, x0, wd, p, c_tile,
                        branchless=(fold == "il2"),
                    )
                elif fold == "sl2":
                    _fold_rows_carry_sl2(
                        full_buf, band_a, hlo, hhi, x0, wd, p, c_tile
                    )
                else:
                    _fold_rows_carry(
                        full_buf, band_a, hlo, hhi, x0, wd, p, c_tile
                    )
                pooled = _onehot_gather_max(
                    band_a, wd, x0, rx1, rw, w_lim, p, j_cap, c_tile,
                    band_dt,
                )
            elif stage_b_wide == "pyr":
                # wide full-row pyramid stage B (see _onehot_gather_max_pyr)
                x0 = jnp.int32(0)
                if hpyr:
                    _fold_rows_carry_h4(
                        full_buf, l2_buf, band_a, hlo, hhi, x0, wd, p,
                        c_tile,
                    )
                elif fold in ("il", "il2"):
                    _fold_rows_interleaved(
                        full_buf, band_a, hlo, hhi, x0, wd, p, c_tile,
                        branchless=(fold == "il2"),
                    )
                elif fold == "sl2":
                    _fold_rows_carry_sl2(
                        full_buf, band_a, hlo, hhi, x0, wd, p, c_tile
                    )
                else:
                    _fold_rows_carry(
                        full_buf, band_a, hlo, hhi, x0, wd, p, c_tile
                    )
                if ablate == "nodot":
                    pooled = band_a[:, :p].astype(jnp.float32)
                else:
                    pooled = _onehot_gather_max_pyr(
                        band_a, wd, rx1, rw, w_lim, p, c_tile,
                        band_dt, l_max, ablate=ablate,
                    )
            else:
                x0 = jnp.int32(0)
                band_a[:, :wd] = jnp.full((p, wd, c_tile), neg, band_dt)
                _fold_rows(
                    full_buf, band_a, None, hlo, hhi, x0, wd, w_sl, p
                )
                wlo, whi = w_edges()
                col = jax.lax.broadcasted_iota(jnp.int32, (wd, 1), 0) + x0
                pooled = _band_max(band_a, wd, col, wlo, whi, p).astype(
                    jnp.float32
                )
            # empty bins -> 0 (torchvision convention). tile8 payloads are
            # int8-range with -128/-2^30 empty fills, so -127.5 separates
            # exactly; float walks use the NEG sentinel.
            pooled = jnp.where(pooled <= empty_thr, 0.0, pooled)
            if ablate == "cheapstore":
                # measurement: full compute, [1, 1, CT] store (WRONG results)
                out_ref[0, 0, 0, i] = (
                    pooled[0, 0] * gate
                ).astype(out_ref.dtype)
                return
            _write_out(
                out_ref, scale_ref, [pooled], gate, i,
                rbi * roi_block + i, quant, nmajor, n56c,
            )

        if cls_ref is not None:
            # width-class-sorted blocks: ONE branch per 8-ROI block instead
            # of per ROI (per-ROI class branches measured +247 ms; see
            # POOL_WIN history), with the cheapest static window per class
            cls = cls_ref[b * n_blocks + rbi]
            for cid, (w_sl, jc) in enumerate(cls_wins):
                if w_sl is not None and w_sl > w_dma:
                    # window wider than the feature row: the host class
                    # assignment (pool_width_classes) never emits this id,
                    # but the branch body must still trace — as wide
                    w_sl, jc = None, None

                @pl.when(cls == cid)
                def _(w_sl=w_sl, jc=jc):
                    for i in range(roi_block):
                        plain_body(i, w_sl, jc)
        else:
            # candidate budget: bin width <= ceil((win-7)/p) + 1, rounded up
            # to the POOL_WIN_CLASSES table values (24->4, 48->8, 96->16):
            # the minimal j_cap=7 at win=48 (one-hot rows k=49) measured
            # 266 ms pool-only vs 92 at j_cap=8 (k=56) on v5e — the
            # misaligned dot/reshape hits a Mosaic slow path
            j_cap_win = -(-(win - 7) // p) + 1
            if win >= w_dma:
                # full-row window (the width-split wide segment): the
                # candidate budget must cover the widest CLIPPED bin,
                # ceil((w_lim+1)/p) + 1 (rw <= w_lim + 1 for image-clipped
                # boxes)
                j_cap_win = max(j_cap_win, -(-(w_lim + 1) // p) + 1)
            for w_c, j_c in cls_wins:
                if w_c is not None and w_c >= win and j_c >= j_cap_win:
                    j_cap_win = j_c
                    break
            else:
                # untabled budget (full-row windows): round up to 8 — the
                # misaligned k = p*j_cap one-hot/reshape hits a Mosaic slow
                # path (j_cap=7/k=49 measured 266 vs 184 ms at j_cap=8)
                j_cap_win = -(-j_cap_win // 8) * 8
            # full-row MXU candidate budget: covers every ROI whose UNCLIPPED
            # width fits 7*(j_wide-1) — all image-clipped boxes at any
            # resolution (bin width <= ceil(rw/p) + 1); rounded to 8 for the
            # aligned one-hot/reshape shapes (k = p*j_cap)
            j_wide = -(-(-(-w_lim // p) + 1) // 8) * 8
            if (
                force_narrow and pipe and not hpyr
                and not w8hc and stage_b == "dots" and fold == "seq"
                and not ablate
            ):
                # software-pipelined block: A(i+1) precedes B(i) in program
                # order (bands double-buffered -> no hazard), exposing
                # VPU-walk/MXU-dot co-issue to Mosaic's scheduler. At
                # win >= w_dma this is the full-row single-body program
                # (exact for every image-clipped box — stage B uses the
                # j_cap_win gather dots, which cover clipped widths).
                def pipe_a(i):
                    ri = rbi * roi_block + i
                    band_a = band_a2.at[i % 2]
                    gate = load_g(goff + ri)
                    rx1, rw, hlo, hhi, _ = _unpack_region_meta(
                        load_m, moff + ri * mw, p, w_lim
                    )
                    x0 = jnp.clip(rx1, 0, max(w_dma - win, 0))
                    x0 = pl.multiple_of((x0 // 8) * 8, 8)
                    _fold_rows_carry(
                        full_buf, band_a, hlo, hhi, x0, min(win, w_dma), p,
                        c_tile, n_unroll=row_unroll,
                    )
                    return x0, rx1, rw, gate

                def pipe_b(i, m_):
                    x0, rx1, rw, gate = m_
                    band_a = band_a2.at[i % 2]
                    pooled = _onehot_gather_max(
                        band_a, win, x0, rx1, rw, w_lim, p, j_cap_win,
                        c_tile, band_dt,
                    )
                    pooled = jnp.where(pooled <= empty_thr, 0.0, pooled)
                    _write_out(
                        out_ref, scale_ref, [pooled], gate, i,
                        rbi * roi_block + i, quant, nmajor, n56c,
                    )

                m_c = pipe_a(0)
                for i in range(roi_block):
                    nxt = pipe_a(i + 1) if i + 1 < roi_block else None
                    pipe_b(i, m_c)
                    m_c = nxt
                return
            for i in range(roi_block):
                if force_narrow:
                    # caller GUARANTEES every ROI fits the window budget
                    # (width-split segments): the wide body is never traced,
                    # so the ROI pays only the windowed walk + gather dots.
                    # At win == w_dma the "window" is the full row and the
                    # guarantee is just that boxes are image-clipped (bin
                    # width <= j_cap_win); the pyramid form then replaces
                    # the width-sized j-dot budget unless stage_b_wide
                    # selects otherwise.
                    if win >= w_dma and stage_b_wide == "pyr":
                        plain_body(i, None, None)
                    else:
                        plain_body(i, win, j_cap_win)
                elif narrow_enabled:
                    rw = load_m(moff + (rbi * roi_block + i) * mw) >> 16
                    narrow = rw <= win - 7

                    @pl.when(narrow)
                    def _(i=i):
                        plain_body(i, win, j_cap_win)

                    if wide_dot:
                        monster = rw > 7 * (j_wide - 1)

                        @pl.when(jnp.logical_and(
                            jnp.logical_not(narrow), jnp.logical_not(monster)
                        ))
                        def _(i=i):
                            plain_body(i, None, j_wide)

                        @pl.when(jnp.logical_and(
                            jnp.logical_not(narrow), monster
                        ))
                        def _(i=i):
                            plain_body(i, None, None)
                    else:
                        @pl.when(jnp.logical_not(narrow))
                        def _(i=i):
                            plain_body(i, None, None)
                else:
                    plain_body(i, None, None)
        return

    for i in range(roi_block):
        ri = rbi * roi_block + i
        if loop_merged:
            # merged band: a/b are lane-block halves of ONE [p, w, 2CT]
            # buffer, so each walk's TWO bands feed stage B as a single
            # [wd, 2CT] dot rhs — 14 gather dots per ROI instead of 28
            # (the dots are fill/drain-bound: ~72 ns each regardless of
            # width, measured 2026-08-20)
            band_ab = band_a2.at[i % 2]
            band_a = band_a2.at[i % 2, :, :, pl.ds(0, c_tile)]
            band_b = band_a2.at[i % 2, :, :, pl.ds(c_tile, c_tile)]
        else:
            band_ab = None
            band_a = band_a2.at[i % 2]
            band_b = band_b2.at[i % 2]

        # ---- ROILoopPool: ROI / frame / context ------------------------
        # all geometry (two regions + hole/row-condition edges) precomputed
        # vectorized in XLA (_pack_loop_meta) and prefetched
        gate = load_g(goff + ri)
        k2 = 2 + 2 * p
        vals = _unpack_words(load_m, moff + ri * mw, 4 * p + 12)
        rx1_r, rw_r, hlo_r, hhi_r, we_r = _region_vals_to_meta(
            vals[:k2], p, w_lim
        )
        rx1_o, rw_o, hlo_o, hhi_o, we_o = _region_vals_to_meta(
            vals[k2 : 2 * k2], p, w_lim
        )
        ixa, ixb, rxa, rxb, iya, iyb, rya, ryb = vals[2 * k2 :]

        def compute_loop(x0, w_sl, jc=16):
            # jc: one-hot candidate budget per bin (narrow win96 default:
            # bin width <= ceil(89/7)+1 = 14 -> 16)
            wd = w_sl or w_dma
            init = jnp.full((p, wd, c_tile), neg, band_dt)
            dt = band_dt

            # walk 1: ROI rows -> band_a (all), band_b (outside inner)
            cond1 = lambda h: jnp.logical_or(h <= iya, h >= iyb)
            band_b[:, :wd] = init
            if w_sl is not None:
                _fold_rows_carry_pair(
                    full_buf, band_a, band_b, hlo_r, hhi_r, x0, w_sl, p,
                    c_tile, cond1,
                )
            else:
                band_a[:, :wd] = init
                _fold_rows(
                    full_buf, band_a, band_b, hlo_r, hhi_r, x0, wd, w_sl, p,
                    row_cond=cond1,
                )
            if w_sl is not None and loop_merged:
                # merged MXU stage B: ONE dot set over the [wd, 2CT]
                # a|b band pair; the a-half's plain and b-half's plain
                # reduces share one merged j-group pass (same mask)
                vab, valid_r, tabs_r = _onehot_candidates(
                    band_ab, wd, x0, rx1_r, rw_r, w_lim, p, jc,
                    2 * c_tile, dt
                )
                hole_f = jnp.logical_and(
                    valid_r,
                    jnp.logical_or(tabs_r <= ixa, tabs_r >= ixb),
                )
                merged = _jgroup_max(vab, valid_r, p, jc, 2 * c_tile)
                pooled_roi = merged[..., :c_tile]
                f2 = merged[..., c_tile:]
                f1 = _jgroup_max(
                    [v[:, :c_tile] for v in vab], hole_f, p, jc, c_tile
                )
            elif w_sl is not None:
                # MXU stage B: ONE candidate-gather dot set per band,
                # shared across the region variants (hole masks apply at
                # the j-group reduce, not in the dot)
                va, valid_r, tabs_r = _onehot_candidates(
                    band_a, wd, x0, rx1_r, rw_r, w_lim, p, jc, c_tile, dt
                )
                vb, _, _ = _onehot_candidates(
                    band_b, wd, x0, rx1_r, rw_r, w_lim, p, jc, c_tile, dt
                )
                hole_f = jnp.logical_and(
                    valid_r,
                    jnp.logical_or(tabs_r <= ixa, tabs_r >= ixb),
                )
                pooled_roi = _jgroup_max(va, valid_r, p, jc, c_tile)
                f1 = _jgroup_max(va, hole_f, p, jc, c_tile)
                f2 = _jgroup_max(vb, valid_r, p, jc, c_tile)
            else:
                wlo_r, whi_r = we_r()
                col = jax.lax.broadcasted_iota(jnp.int32, (wd, 1), 0) + x0
                pooled_roi = _band_max(band_a, wd, col, wlo_r, whi_r, p)
                f1 = _band_max(
                    band_a, wd, col, wlo_r, whi_r, p, hole_x=(ixa, ixb)
                )
                f2 = _band_max(band_b, wd, col, wlo_r, whi_r, p)
            # maxval starts at 0 in the reference kernel (inputs >= 0)
            roi_v = jnp.maximum(pooled_roi.astype(jnp.float32), 0.0)
            frame_v = jnp.maximum(
                jnp.maximum(f1, f2).astype(jnp.float32), 0.0
            )

            # walk 2: outer rows -> band_a (all), band_b (outside ROI)
            cond2 = lambda h: jnp.logical_or(h <= rya, h >= ryb)
            band_b[:, :wd] = init
            if w_sl is not None:
                _fold_rows_carry_pair(
                    full_buf, band_a, band_b, hlo_o, hhi_o, x0, w_sl, p,
                    c_tile, cond2,
                )
            else:
                band_a[:, :wd] = init
                _fold_rows(
                    full_buf, band_a, band_b, hlo_o, hhi_o, x0, wd, w_sl, p,
                    row_cond=cond2,
                )
            if w_sl is not None and loop_merged:
                vab, valid_o, tabs_o = _onehot_candidates(
                    band_ab, wd, x0, rx1_o, rw_o, w_lim, p, jc,
                    2 * c_tile, dt
                )
                hole_c = jnp.logical_and(
                    valid_o,
                    jnp.logical_or(tabs_o <= rxa, tabs_o >= rxb),
                )
                # per-half masks (hole for the a-half, plain for b) ride
                # one [k, 2CT] mask through a single merged j-group pass
                kk = p * jc
                mask2 = jnp.concatenate(
                    [
                        jnp.broadcast_to(hole_c, (kk, c_tile)),
                        jnp.broadcast_to(valid_o, (kk, c_tile)),
                    ],
                    axis=1,
                )
                merged = _jgroup_max(vab, mask2, p, jc, 2 * c_tile)
                c1 = merged[..., :c_tile]
                c2 = merged[..., c_tile:]
            elif w_sl is not None:
                va, valid_o, tabs_o = _onehot_candidates(
                    band_a, wd, x0, rx1_o, rw_o, w_lim, p, jc, c_tile, dt
                )
                vb, _, _ = _onehot_candidates(
                    band_b, wd, x0, rx1_o, rw_o, w_lim, p, jc, c_tile, dt
                )
                hole_c = jnp.logical_and(
                    valid_o,
                    jnp.logical_or(tabs_o <= rxa, tabs_o >= rxb),
                )
                c1 = _jgroup_max(va, hole_c, p, jc, c_tile)
                c2 = _jgroup_max(vb, valid_o, p, jc, c_tile)
            else:
                wlo_o, whi_o = we_o()
                col = jax.lax.broadcasted_iota(jnp.int32, (wd, 1), 0) + x0
                c1 = _band_max(
                    band_a, wd, col, wlo_o, whi_o, p, hole_x=(rxa, rxb)
                )
                c2 = _band_max(band_b, wd, col, wlo_o, whi_o, p)
            ctx_v = jnp.maximum(jnp.maximum(c1, c2).astype(jnp.float32), 0.0)

            _write_out(
                out_ref, scale_ref, [roi_v, frame_v, ctx_v], gate, i,
                rbi * roi_block + i, quant, nmajor, n56c,
            )

        # wide-body candidate budget: covers bins of boxes up to ~2x the
        # image extent (ceil(2*(w_lim+1)/p)+1, rounded to 8 for the aligned
        # one-hot/reshape shapes). The OUTER region is always image-clipped
        # (meta packing); the RAW ROI region of a monster box beyond ~2x
        # would overflow it — loop_wide='vpu' keeps the exact-for-anything
        # masked-band-max body for such callers. Default is the compact
        # dots body: the old VPU wide body's mere COEXISTENCE taxed the
        # all-narrow loop sweep 2570 -> 1318 ms (measured 2026-08-20 v5e).
        jc_wide = -(-(-(-2 * (w_lim + 1) // p) + 1) // 8) * 8

        def wide_body():
            if loop_wide == "vpu":
                compute_loop(jnp.int32(0), None)
            else:
                compute_loop(jnp.int32(0), w_dma, jc_wide)

        if force_narrow and narrow_enabled:
            # caller GUARANTEES rw_o <= win - 7 and rw_r <= 7*(jc-1) for
            # every valid ROI (width-split loop segments): ONLY the narrow
            # body is traced — the plain path measured the mere TRACING of
            # an extra per-ROI body at up to ~2.8 us/visit. win=48 halves
            # the walk bytes AND the one-hot dot contraction (jc=8; bins
            # <= ceil(41/7)+1 = 7).
            x0 = jnp.clip(rx1_o, 0, w_dma - win)
            x0 = pl.multiple_of((x0 // 8) * 8, 8)
            compute_loop(x0, win, 8 if win <= 48 else 16)
        elif narrow_enabled:
            # rw_r is the UNCLIPPED ROI width: an ROI mostly outside the
            # image can have rw_r >> rw_o, overflowing the j_cap=16
            # candidate budget of the MXU stage B -> force it wide
            narrow = jnp.logical_and(rw_o <= win - 7, rw_r <= 7 * 15)
            x0 = jnp.clip(rx1_o, 0, w_dma - win)
            x0 = pl.multiple_of((x0 // 8) * 8, 8)

            @pl.when(narrow)
            def _():
                compute_loop(x0, win)

            @pl.when(jnp.logical_not(narrow))
            def _():
                wide_body()
        else:
            wide_body()


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size", "spatial_scale", "c_take", "c_tile", "roi_block",
        "loop_pool", "context_ratio", "quant", "interpret", "out_layout",
        "meta_dma", "win", "force_narrow", "pipe", "row_unroll", "hpyr",
        "loop_merged", "loop_wide", "stage_b",
        "stage_b_wide", "fold", "wide_dot", "ablate",
    ),
)
def roi_pool_fused_batched(
    feat: jnp.ndarray,  # [B or n_br*B, H, W, C] (branch-major concat w/ src_tbl)
    rois: jnp.ndarray,  # [B, N, 4] image-coord XYXY
    gate: jnp.ndarray,  # [B, N] per-ROI output scale ((obj+1)*valid; pads 0)
    c_base=0,  # dynamic scalar: first channel of this chunk
    output_size: int = 7,
    spatial_scale: float = 1.0,
    c_take: int | None = None,
    c_tile: int | None = None,
    roi_block: int | None = None,
    loop_pool: bool = False,
    context_ratio: float = 1.8,
    quant: str = "none",
    src_tbl: jnp.ndarray | None = None,  # [B, N//roi_block] int32
    cls_tbl: jnp.ndarray | None = None,  # [B, N//roi_block] int32
    interpret: bool = False,
    out_layout: str = "hwnc",  # "hwnc" [(3,)B,P,P,N,CT] | "nhwc"
    # [(3,)B,N,P,P,CT] | "n56c" [(3,)B,N,56,CT] ((ph,pw) flattened and
    # zero-padded to 56 — the sublane-aligned per-ROI store, pair with
    # ChunkedDenseGeneral chunk_layout="n56c")
    meta_dma: bool | None = None,  # None = auto (when prefetch overflows SMEM)
    win: int | None = None,  # narrow x-window override (plain pool): stage-A
    # walk cost is ~linear in the window, so callers holding a width-sorted
    # ROI segment pick the smallest window covering it; ROIs wider than
    # ``win - 7`` still take the exact full-row fallback
    force_narrow: bool = False,  # caller GUARANTEES rw <= win - 7 for every
    # valid ROI: the wide body is not even traced (wrong results if the
    # guarantee is violated — use only with value-thresholded width splits)
    pipe: bool | None = None,  # force_narrow windowed blocks: software-
    # pipeline A(i+1) before B(i)/store(i) (None = WSOVOD_POOL_PIPE env)
    row_unroll: int | None = None,  # static per-bin row cap for the narrow
    # stage-A fold: replaces each bin's dynamic-trip fori with a masked
    # unroll. Correct only when rh <= (row_unroll - 1) * output_size for
    # every valid ROI (value-thresholded height splits).
    hpyr: bool = False,  # stage A via a SHARED H-direction 4-row range-max
    # pyramid built once per resident-tile refresh: bins >= 4 rows fold
    # ceil(n/4) pyramid rows instead of n raw rows (exact; the walk is
    # VMEM-bandwidth-bound, so tall bins cut their bytes ~3.5x). Costs a
    # second tile-sized VMEM buffer — the auto c_tile heuristic halves.
    # Plain pool only (no loop_pool/w8hc).
    loop_merged: bool | None = None,  # loop pool: merge each walk's a/b
    # bands into one [p, w, 2CT] buffer so stage B runs 14 gather dots +
    # 3 j-group passes per ROI instead of 28 + 5 (same VMEM).
    # None = WSOVOD_LOOP_MERGED env, default ON.
    loop_wide: str | None = None,  # loop wide body: "dots" (default; see
    # kernel) | "vpu" exact-for-monster-boxes masked band max.
    # None = WSOVOD_LOOP_WIDE env.
    stage_b: str = "dots",  # narrow plain-pool stage B: "dots" = 7 per-ph
    # gather dots; "bd" = ONE block-diag [p*k, p*wd] gather dot (see
    # _onehot_candidates_bd)
    stage_b_wide: str = "pyr",  # wide full-row stage B: "pyr" = in-place
    # range-max pyramid + 5-span gather (exact for image-clipped rois —
    # every shipped caller clips; see _onehot_gather_max_pyr) | "vpu" =
    # _band_max, exact for arbitrary boxes (measured ~5x slower all-wide)
    fold: str = "seq",  # stage A: "seq" per-bin carry fold | "il"/"il2" p-way
    # interleaved in-place folds (see _fold_rows_interleaved) | "sl2"
    # 2-row slab carry fold
    wide_dot: bool = False,  # wide (rw > win-7) ROIs take a full-row-band
    # MXU gather stage B as a 3rd per-ROI body — MEASURED DEAD on v5e
    # (see _fused_pool_kernel wide_dot comment); use the width-split wide
    # segment (win >= w_dma + force_narrow) instead.
    ablate: str = "",  # measurement-only stage ablations (WRONG results):
    # "nodot" skips stage B, "nojg" skips the j-group reduce, "cheapstore"
    # stores one [CT] row per ROI
):
    """Max-pool ``feat[..., c_base:c_base+c_take]`` for every ROI of every
    image; hwnc output.

    Returns (bf16/f32 path) ``[(3,) B, P, P, N, c_take]`` in ``feat.dtype``,
    already scaled by ``gate``; or (``quant='int8'``) a tuple of the int8
    payload (same shape) and per-(ROI, c-tile) scales
    ``[(3,) B, n_ct, N]`` f32 with the gate folded in; or
    (``quant='maxabs'``) a tuple of the gated bf16/f32 payload and per-(ROI,
    lane) maxabs partials ``[(3,) B, n_ct, N, c_tile]`` f32 (reduce the last
    axis to get the exact per-(ROI, c-tile) maxabs of the payload).

    ``src_tbl`` (MRRP branch routing) gives each 8-ROI block's feature
    dim-0 source (``branch * B + image`` for the reference's branch-major
    concat layout, reference ``wsovod/modeling/poolers.py:111-116``); the
    caller must hand branch-pure blocks (ROIs sorted by branch, segments
    padded to the block size) and ``N`` must be block-aligned.
    """
    b = rois.shape[0]
    h, w, c = feat.shape[1:]
    n = rois.shape[1]
    p = output_size
    c_take = c if c_take is None else c_take
    if roi_block is None:
        # 8 keeps the unrolled Mosaic program (and its compile time) small;
        # larger blocks measured no faster (cost is per-ROI, not per-block)
        roi_block = 8

    if quant == "tile8" and feat.dtype != jnp.int8:
        # tile8: pre-quantize the chunk per image in XLA (cheap pass over the
        # feature slice), then the WHOLE kernel runs int8 — half the VPU walk
        # bytes, the 2x int8 MXU gather rate, half the payload HBM write —
        # and the downstream fc1 int8 GEMM consumes the payload directly (no
        # separate quantize pass over the pooled tensor at all). max commutes
        # with the monotone per-image quantization, so the emitted payload is
        # EXACTLY the quantized true pooled values; precision vs the per-ROI
        # 'int8' mode is coarser (per-image scale), guarded by
        # tests/test_golden_eval_int8.py + the module agreement tests.
        assert src_tbl is None, "tile8 does not support MRRP branch routing yet"
        assert not loop_pool, "tile8 is a plain-ROIPool mode for now"
        # c_base is a traced operand (not static): dynamic slice
        fs = jax.lax.dynamic_slice_in_dim(feat, c_base, c_take, axis=-1)
        f32 = fs.astype(jnp.float32)
        s = jnp.max(jnp.abs(f32), axis=(1, 2, 3)) / 127.0  # [B]
        s = jnp.maximum(s, 1e-20)
        q = jnp.clip(jnp.round(f32 / s[:, None, None, None]), -127, 127)
        # int8 TILES with widen-on-load bands (the round-5 hybrid): Mosaic
        # cannot legalize max over int8 vectors ('Reductions over int8 not
        # implemented'), but it DOES legalize int8 loads + an i8->bf16
        # widen (measured 2026-08-20, scripts/bench_i8walk.py), so the
        # resident tile stays int8 — HALF the DMA and stage-A VMEM walk
        # bytes (the walk is load-port-bound: ~1.9 TB/s) — and each loaded
        # row widens into the proven bf16 band/max path. bf16 holds +-127
        # ints exactly, so the pooled payload is still the exact quantized
        # max, and the STORE casts back to int8 (halving the payload HBM
        # write). WSOVOD_TILE8_I8=0 restores the int8-VALUED bf16 carrier
        # (full-size tiles, no widen) for A/Bs.
        walk_dt = (
            jnp.bfloat16 if os.environ.get("WSOVOD_TILE8_I8") == "0"
            else jnp.int8
        )
        feat = q.astype(walk_dt)
        gate = gate * s[:, None]  # scale folds into the emitted per-ROI scale
        c_base, c = 0, c_take

    payload_dt = feat.dtype
    if (
        quant in (None, "none")
        and jnp.dtype(feat.dtype) != jnp.int8
        and os.environ.get("WSOVOD_POOL_FEAT_I8") == "1"
    ):
        # FEAT_I8 (A/B, WSOVOD_POOL_FEAT_I8=1): int8 feature tiles for the
        # BF16-payload paths — including loop pool and MRRP branch routing,
        # which tile8 does not cover. The chunk quantizes per feature-row-0
        # entry (per image; per (branch, image) for the MRRP branch-major
        # concat), the kernel walks int8 tiles (half the load-port bytes,
        # see the tile8 comment above) widened into bf16 bands, and the
        # positive per-ROI dequant scale folds into the GATE (the epilogue
        # multiplies payload by gate, and max commutes with a positive
        # scale), so the emitted bf16 payload equals the per-source
        # int8-quantized true pooled values — the same precision contract
        # as tile8, guarded by tests/test_golden_eval_int8.py. Training is
        # safe: the AD wrappers' backward uses the jnp reference pool +
        # the analytic gate formula, not the kernel internals.
        fs = jax.lax.dynamic_slice_in_dim(feat, c_base, c_take, axis=-1)
        f32 = fs.astype(jnp.float32)
        s = jnp.max(jnp.abs(f32), axis=(1, 2, 3)) / 127.0  # [B or n_br*B]
        s = jnp.maximum(s, 1e-20)
        feat = jnp.clip(
            jnp.round(f32 / s[:, None, None, None]), -127, 127
        ).astype(jnp.int8)
        if src_tbl is not None:
            # per-ROI source scale: blocks are branch-pure, src = br*B + b
            s_roi = jnp.repeat(s[src_tbl], roi_block, axis=1)[:, : gate.shape[1]]
        else:
            s_roi = s[:, None]
        gate = gate * s_roi
        c_base, c = 0, c_take

    n_pad_est = n + (-n) % roi_block
    # packed meta words + f32 gate table per ROI
    roi_bytes = ((_loop_meta_words(p) if loop_pool else _meta_words(p)) + 1) * 4
    if meta_dma is None:
        # auto: stream per-image tables HBM -> SMEM scratch inside the kernel
        # whenever prefetching all B images' tables would overflow SMEM.
        # (Round 3 B-SPLIT the call instead — the two half-batch outputs then
        # hit a jnp.concatenate that re-materializes the multi-GB pooled
        # tensor downstream: ~85 ms/sweep at the COCO bench shape, the
        # round-3 "chain gap". One call + per-image DMA has no such copy.)
        meta_dma = b * n_pad_est * roi_bytes > SMEM_BUDGET

    if hpyr:
        assert not loop_pool and out_layout != "w8hc", (
            "hpyr is a plain-pool stage-A mode"
        )
    if c_tile is None:
        itemsize = {1: 1, 2: 2}.get(jnp.dtype(feat.dtype).itemsize, 4)
        c_tile = 256 if loop_pool else 512  # loop pool: 2 extra band buffers
        tiles = 2 if hpyr else 1  # hpyr: the l2 pyramid doubles tile VMEM
        while c_tile > 128 and (
            h * (-(-w // 8) * 8) * c_tile * itemsize * tiles > 12_500_000
            or c_take % c_tile != 0
        ):
            c_tile //= 2
    assert c_take % c_tile == 0, (c_take, c_tile)
    assert c_tile % 128 == 0, c_tile
    n_ct = c_take // c_tile

    w_dma = -(-w // 8) * 8
    if w_dma != w:
        feat = jnp.pad(feat, ((0, 0), (0, 0), (0, w_dma - w), (0, 0)))
    if win is None:
        win = LOOP_WIN if loop_pool else POOL_WIN
    else:
        assert win % 8 == 0, win
        win = min(win, w_dma)  # full-row segment callers pass win >= w_dma
        if loop_pool:
            # loop accepts a win override only for the force-narrow
            # single-body programs (win=LOOP_WIN, or win=48 with the halved
            # jc=8 candidate budget — the caller then guarantees rw_o <= 41
            # AND rw_r <= 49) or the wide-only single-body program
            # (win >= w_dma: narrow_enabled goes False and every ROI takes
            # the branch-free wide body — per-ROI pl.when bodies EXECUTE
            # even when not taken on this Mosaic, so the two-body loop
            # program pays the wide walk for every narrow ROI: 2570 ms vs
            # 1318 force-narrow, measured 2026-08-20)
            assert (
                force_narrow and win in (48, LOOP_WIN)
            ) or win >= w_dma, (win, force_narrow)
    narrow_enabled = w_dma > win  # loop pool only; plain picks per-ROI class
    if pipe is None:
        pipe = os.environ.get("WSOVOD_POOL_PIPE") == "1"
    if loop_merged is None:
        loop_merged = os.environ.get("WSOVOD_LOOP_MERGED", "1") == "1"
    loop_merged = loop_merged and loop_pool
    if loop_wide is None:
        # two-body default stays "vpu": with BOTH bodies traced, the dots
        # wide body measured WORSE end-to-end (MRRP step 4139 vs 3637 ms)
        # — per-ROI pl.when bodies execute even when not taken, and the
        # jc_wide dot set costs more than the masked band max it replaces
        # on narrow-heavy mixes. The single-body wide-only program (win >=
        # w_dma) selects "dots" explicitly.
        loop_wide = os.environ.get("WSOVOD_LOOP_WIDE", "vpu")
    # static pyramid depth: k <= floor(log2(max(m_max - 1, 1))) for
    # image-clipped ROIs (m_max = max rw // p = (w + 1) // p)
    l_max = max((max((w + 1) // p - 1, 1)).bit_length() - 1, 1)

    pad = (-n) % roi_block
    n_pad = n + pad
    rois_p = jnp.pad(rois.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    gate_p = jnp.pad(gate.astype(jnp.float32), ((0, 0), (0, pad)))
    if loop_pool:
        meta = _pack_loop_meta(rois_p, spatial_scale, p, h, w, context_ratio)
        mw = _loop_meta_words(p)
    else:
        meta = _pack_region_meta(rois_p, spatial_scale, p, h)
        mw = _meta_words(p)
    if meta_dma:
        # per-image rows as [B, row/128, 128]: the tiled pair is the last
        # two dims, so the per-image DMA slice on dim 0 needs no alignment.
        # Rows pad to a multiple of 8*128 words: the DMA is issued in
        # <= 256-row slabs (larger single SMEM DMAs fault the chip) whose
        # 8-aligned sizes the tiled HBM slice requires.
        m_row = -(-(n_pad * mw) // 1024) * 1024
        g_row = -(-n_pad // 1024) * 1024
        roi_tbl = jnp.pad(
            meta.reshape(b, n_pad * mw), ((0, 0), (0, m_row - n_pad * mw))
        ).reshape(b, m_row // 128, 128)
        gate_tbl = jnp.pad(gate_p, ((0, 0), (0, g_row - n_pad))).reshape(
            b, g_row // 128, 128
        )
    else:
        roi_tbl = meta.reshape(-1)
        gate_tbl = gate_p.reshape(-1)
    cbase = jnp.asarray([c_base], jnp.int32)
    if src_tbl is None:
        src_flat = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], (b, n_pad // roi_block)
        ).reshape(-1)
    else:
        assert pad == 0, "src_tbl requires block-aligned N"
        assert src_tbl.shape == (b, n_pad // roi_block), src_tbl.shape
        src_flat = src_tbl.astype(jnp.int32).reshape(-1)
    if cls_tbl is not None:
        assert not loop_pool, "width classes are a plain-pool feature"
        assert pad == 0, "cls_tbl requires block-aligned N"
        assert cls_tbl.shape == (b, n_pad // roi_block), cls_tbl.shape
        cls_flat = cls_tbl.astype(jnp.int32).reshape(-1)
    else:
        cls_flat = None

    tri = (3,) if loop_pool else ()
    out_dtype = jnp.int8 if quant in ("int8", "tile8") else payload_dt
    nd = len(tri)
    nmajor = out_layout == "nhwc"
    n56c = out_layout == "n56c"
    w8hc = out_layout == "w8hc"
    if w8hc:
        # single-dot stage B (see _onehot_gather_max_w): per-ROI contiguous
        # [8(pw, 7 padded), 8*CT(ph-blocks, ph=7 zeroed)] stores; consumer
        # flattens the ADJACENT (pw, ph, c) minor dims — no relayout
        assert not loop_pool and force_narrow and quant == "none", (
            "w8hc currently supports the plain narrow fp path only"
        )
        out_spec = pl.BlockSpec(
            tri + (1, roi_block, 8, 8 * c_tile),
            lambda bi, ci, rbi, *_: (0,) * nd + (bi, rbi, 0, ci),
        )
        out_shapes = [
            jax.ShapeDtypeStruct(tri + (b, n_pad, 8, 8 * c_take), out_dtype)
        ]
    elif n56c:
        # per-ROI CONTIGUOUS [56, CT] stores (see _write_out): output
        # [(3,) B, N_pad, 56, c_take]; the fc1 consumer contracts the
        # ADJACENT (56, c) minor dims, so no relayout on either side
        out_spec = pl.BlockSpec(
            tri + (1, roi_block, p * 8, c_tile),
            lambda bi, ci, rbi, *_: (0,) * nd + (bi, rbi, 0, ci),
        )
        out_shapes = [
            jax.ShapeDtypeStruct(tri + (b, n_pad, p * 8, c_take), out_dtype)
        ]
    elif nmajor:
        # n-major output: (h, w, c) adjacent-in-order, so the downstream fc1
        # contraction collapses them without the cross-N transpose the hwnc
        # layout forces (measured ~85 ms across the 4-chunk bench sweep)
        out_spec = pl.BlockSpec(
            tri + (1, roi_block, p, p, c_tile),
            lambda bi, ci, rbi, *_: (0,) * nd + (bi, rbi, 0, 0, ci),
        )
        out_shapes = [
            jax.ShapeDtypeStruct(tri + (b, n_pad, p, p, c_take), out_dtype)
        ]
    else:
        out_spec = pl.BlockSpec(
            tri + (1, p, p, roi_block, c_tile),
            lambda bi, ci, rbi, *_: (0,) * nd + (bi, 0, 0, rbi, ci),
        )
        out_shapes = [
            jax.ShapeDtypeStruct(tri + (b, p, p, n_pad, c_take), out_dtype)
        ]
    out_specs = [out_spec]
    if quant in ("int8", "tile8"):
        # scales are written as scalars -> SMEM block (VMEM refs reject
        # scalar stores); the row spans all of N_pad with an rbi-independent
        # index so it stays resident across the inner ROI sweep
        out_specs.append(
            pl.BlockSpec(
                tri + (1, 1, n_pad),
                lambda bi, ci, rbi, *_: (0,) * nd + (bi, ci, 0),
                memory_space=pltpu.SMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct(tri + (b, n_ct, n_pad), jnp.float32)
        )
    elif quant == "maxabs":
        # per-(ROI, lane) maxabs partials of the emitted (gated) payload:
        # the XLA quantize pass finishes the reduce over this small array
        # instead of re-reading the full chunk
        out_specs.append(
            pl.BlockSpec(
                tri + (1, 1, roi_block, c_tile),
                lambda bi, ci, rbi, *_: (0,) * nd + (bi, ci, rbi, 0),
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct(tri + (b, n_ct, n_pad, c_tile), jnp.float32)
        )

    # the band must hold the full row for the wide-ROI path; narrow ROIs use
    # its leading [:, :win] slice. Leading 2 = per-ROI double buffering (see
    # the kernel's band_a2 comment).
    w_band = w_dma
    # int8 feature tiles (tile8 hybrid) widen into bf16 BANDS on load:
    # the tile keeps the halved bytes, the bands keep the legal max path
    band_dt = (
        jnp.bfloat16 if jnp.dtype(feat.dtype) == jnp.int8 else feat.dtype
    )
    scratch = [
        pltpu.VMEM((1, h, w_dma, c_tile), feat.dtype),
        pltpu.VMEM((1, h, w_dma, c_tile), feat.dtype) if hpyr else None,
        pltpu.VMEM(
            (2, p, w_band, 2 * c_tile if loop_merged else c_tile),
            band_dt,
        ),
    ]
    scratch.append(
        pltpu.VMEM((2, p, w_band, c_tile), band_dt)
        if (loop_pool and not loop_merged)
        else None
    )
    scratch.append(
        pltpu.VMEM((win, 8 * c_tile), band_dt) if w8hc else None
    )
    scratch = [s for s in scratch if s is not None]
    scratch.append(pltpu.SemaphoreType.DMA)
    if meta_dma:
        scratch += [
            pltpu.SMEM((m_row // 128, 128), jnp.int32),
            pltpu.SMEM((g_row // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]

    def kernel_entry(*args):
        if meta_dma:
            cbase_s, src_s = args[:2]
            rest = args[2:]
            if cls_flat is not None:
                cls_s, rest = rest[0], rest[1:]
            else:
                cls_s = None
            meta_hbm, gate_hbm, feat_ref = rest[:3]
            rest = rest[3:]
        else:
            rois_s, gate_s, cbase_s, src_s = args[:4]
            rest = args[4:]
            if cls_flat is not None:
                cls_s, rest = rest[0], rest[1:]
            else:
                cls_s = None
            feat_ref = rest[0]
            rest = rest[1:]
        if quant in ("int8", "tile8", "maxabs"):
            out_r, scale_r = rest[0], rest[1]
            rest = rest[2:]
        else:
            out_r, scale_r = rest[0], None
            rest = rest[1:]
        if meta_dma:
            *rest, meta_s, gate_s2, sem_m, sem_g = rest
            rois_s, gate_s = meta_s, gate_s2
        l2s = None
        if loop_pool and loop_merged:
            full, ba, sem_ = rest
            bb = wb = None
        elif loop_pool:
            full, ba, bb, sem_ = rest
            wb = None
        elif w8hc:
            full, ba, wb, sem_ = rest
            bb = None
        elif hpyr:
            full, l2s, ba, sem_ = rest
            bb = wb = None
        else:
            full, ba, sem_ = rest
            bb = wb = None
        if meta_dma:
            bq = pl.program_id(0)

            @pl.when(
                jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0)
            )
            def _():
                cps = []
                for ref_h, ref_s, sem_x in (
                    (meta_hbm, rois_s, sem_m),
                    (gate_hbm, gate_s, sem_g),
                ):
                    rows = ref_s.shape[0]
                    for r0 in range(0, rows, 256):
                        sz = min(256, rows - r0)
                        cps.append(
                            pltpu.make_async_copy(
                                ref_h.at[bq, pl.ds(r0, sz)],
                                ref_s.at[pl.ds(r0, sz)],
                                sem_x,
                            )
                        )
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
        _fused_pool_kernel(
            rois_s, gate_s, cbase_s, src_s, cls_s, feat_ref, out_r, scale_r,
            full, l2s, ba, bb, wb, sem_,
            p=p, spatial_scale=spatial_scale, roi_block=roi_block,
            n_pad=n_pad, h_lim=h, w_lim=w, w_dma=w_dma, c_tile=c_tile,
            win=win, narrow_enabled=narrow_enabled, loop_pool=loop_pool,
            context_ratio=context_ratio, quant=quant,
            cls_wins=POOL_WIN_CLASSES, loop_merged=loop_merged,
            loop_wide=loop_wide,
            nmajor=nmajor, n56c=n56c, w8hc=w8hc,
            meta_dma=meta_dma,
            force_narrow=force_narrow, pipe=pipe, row_unroll=row_unroll,
            hpyr=hpyr, stage_b=stage_b, stage_b_wide=stage_b_wide,
            l_max=l_max, fold=fold, wide_dot=wide_dot, ablate=ablate,
        )

    if meta_dma:
        scal_args = (cbase, src_flat)
        call_inputs = (roi_tbl, gate_tbl, feat)
        # the tables MUST stay in HBM: Mosaic otherwise promotes the ~MB
        # meta array to VMEM, whose (8, 128) tiling rejects the 1-row DMA
        # slice (HBM rows are untiled)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
    else:
        scal_args = (roi_tbl, gate_tbl, cbase, src_flat)
        call_inputs = (feat,)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if cls_flat is not None:
        scal_args = scal_args + (cls_flat,)
    two_out = quant in ("int8", "tile8", "maxabs")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scal_args),
        grid=(b, n_ct, n_pad // roi_block),
        in_specs=in_specs,
        out_specs=out_specs if two_out else out_specs[0],
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel_entry,
        grid_spec=grid_spec,
        out_shape=out_shapes if two_out else out_shapes[0],
        interpret=interpret or _INTERPRET,
    )(*scal_args, *call_inputs)
    if nmajor or n56c or w8hc:
        def payload_sl(x):  # [(3,) B, N_pad, ...] -> unpadded N
            return x[(slice(None),) * (nd + 1) + (slice(0, n),)]
    else:
        def payload_sl(x):  # [(3,) B, P, P, N_pad, CT]
            return x[..., :n, :]
    if quant in ("int8", "tile8"):
        vals, scales = out
        return payload_sl(vals), scales[..., :n]
    if quant == "maxabs":
        vals, pmax = out
        return payload_sl(vals), pmax[..., :n, :]
    return payload_sl(out)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11)
)
def roi_pool_fused_ad(
    feat,  # [B, H, W, C]
    rois,  # [B, N, 4]
    gate,  # [B, N] ((objectness+1)*valid; exactly 0 on pads)
    c_base: int = 0,
    c_take: int | None = None,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    loop_pool: bool = False,
    context_ratio: float = 1.8,
    win: int | None = None,
    force_narrow: bool = False,
    loop_wide: str | None = None,
):
    """Differentiable fused max pool + gate (bf16/f32 path; the int8 path is
    inference-only and called via ``roi_pool_fused_batched`` directly).
    Backward: gate cotangent from the saved output (gate >= 1 on valid rows);
    feature cotangent via ``jax.vjp`` of the jnp reference pool — traced but
    DCE'd whenever the backbone is frozen (every shipped config)."""
    return roi_pool_fused_batched(
        feat, rois, gate, c_base=c_base, c_take=c_take,
        output_size=output_size, spatial_scale=spatial_scale,
        loop_pool=loop_pool, context_ratio=context_ratio,
        win=win, force_narrow=force_narrow, loop_wide=loop_wide,
    )


def _pool_ad_fwd(feat, rois, gate, c_base, c_take, output_size, spatial_scale, loop_pool, context_ratio, win, force_narrow, loop_wide):
    out = roi_pool_fused_batched(
        feat, rois, gate, c_base=c_base, c_take=c_take,
        output_size=output_size, spatial_scale=spatial_scale,
        loop_pool=loop_pool, context_ratio=context_ratio,
        win=win, force_narrow=force_narrow, loop_wide=loop_wide,
    )
    return out, (feat, rois, gate, out)


def _pool_ad_bwd(c_base, c_take, output_size, spatial_scale, loop_pool, context_ratio, win, force_narrow, loop_wide, res, g):
    from ..roi_pool import roi_loop_pool, roi_pool

    feat, rois, gate, out = res
    c_take = feat.shape[-1] if c_take is None else c_take
    # hwnc [(3,) B, P, P, N, CT] -> [(3,) B, N, P, P, CT]
    perm = (0, 1, 4, 2, 3, 5) if loop_pool else (0, 3, 1, 2, 4)
    g_n = jnp.transpose(g, perm).astype(jnp.float32)
    out_n = jnp.transpose(out, perm).astype(jnp.float32)

    sum_axes = tuple(range(g_n.ndim - 3, g_n.ndim)) + ((0,) if loop_pool else ())
    safe = jnp.where(jnp.abs(gate) > 1e-8, gate, 1.0)
    g_gate = jnp.where(
        jnp.abs(gate) > 1e-8,
        jnp.sum(g_n * out_n, axis=sum_axes) / safe,
        0.0,
    ).astype(gate.dtype)

    def pool_fn(f):
        fs = jax.lax.slice_in_dim(f, c_base, c_base + c_take, axis=-1)
        per_img = []
        for bi in range(rois.shape[0]):
            if loop_pool:
                pooled = roi_loop_pool(
                    fs[bi], rois[bi], output_size, spatial_scale,
                    context_ratio=context_ratio,
                )  # [3, N, P, P, CT]
            else:
                pooled = roi_pool(fs[bi], rois[bi], output_size, spatial_scale)
            per_img.append(pooled)
        stacked = jnp.stack(per_img, axis=1 if loop_pool else 0)
        gx = gate[:, :, None, None, None].astype(stacked.dtype)
        return stacked * (gx[None] if loop_pool else gx)

    _, vjp = jax.vjp(pool_fn, feat)
    (g_feat,) = vjp(g_n.astype(feat.dtype))
    return g_feat, None, g_gate


roi_pool_fused_ad.defvjp(_pool_ad_fwd, _pool_ad_bwd)


def _branch_src_tbl(branch, b, roi_block):
    """[B, N'] per-ROI branch (branch-pure blocks) -> per-block DMA source
    ``branch * B + image`` for the branch-major concat feature layout."""
    blocks = branch[:, ::roi_block].astype(jnp.int32)
    return blocks * b + jnp.arange(b, dtype=jnp.int32)[:, None]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12)
)
def roi_pool_fused_branched_ad(
    feat,  # [n_br*B, H, W, C] branch-major concat (reference MRRP layout)
    rois,  # [B, N'] branch-sorted, segment-padded (blocks branch-pure)
    gate,  # [B, N'] (exactly 0 on segment pads)
    branch_f,  # [B, N'] per-ROI branch id as FLOAT (int primals would need
    #            float0 cotangents; the value is exact in f32)
    c_base: int = 0,
    c_take: int | None = None,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    loop_pool: bool = False,
    context_ratio: float = 1.8,
    win: int | None = None,
    force_narrow: bool = False,
    loop_wide: str | None = None,
):
    """Differentiable fused max pool + gate with MRRP branch routing: each
    branch-pure 8-ROI block DMAs its resident tile from the branch's feature
    copy. Backward mirrors ``roi_pool_fused_ad`` via the jnp reference pool
    with per-ROI branch selection (DCE'd under a frozen backbone)."""
    branch = branch_f.astype(jnp.int32)
    src = _branch_src_tbl(branch, rois.shape[0], 8)
    return roi_pool_fused_batched(
        feat, rois, gate, c_base=c_base, c_take=c_take,
        output_size=output_size, spatial_scale=spatial_scale,
        loop_pool=loop_pool, context_ratio=context_ratio, src_tbl=src,
        win=win, force_narrow=force_narrow, loop_wide=loop_wide,
    )


def _pool_branched_fwd(
    feat, rois, gate, branch_f, c_base, c_take, output_size, spatial_scale,
    loop_pool, context_ratio, win, force_narrow, loop_wide,
):
    out = roi_pool_fused_branched_ad(
        feat, rois, gate, branch_f, c_base, c_take, output_size,
        spatial_scale, loop_pool, context_ratio, win, force_narrow,
        loop_wide,
    )
    return out, (feat, rois, gate, branch_f, out)


def _pool_branched_bwd(
    c_base, c_take, output_size, spatial_scale, loop_pool, context_ratio,
    win, force_narrow, loop_wide,
    res, g,
):
    from ..roi_pool import roi_loop_pool, roi_pool

    feat, rois, gate, branch_f, out = res
    b = rois.shape[0]
    n_br = feat.shape[0] // b
    branch = branch_f.astype(jnp.int32)
    c_take = feat.shape[-1] if c_take is None else c_take
    perm = (0, 1, 4, 2, 3, 5) if loop_pool else (0, 3, 1, 2, 4)
    g_n = jnp.transpose(g, perm).astype(jnp.float32)
    out_n = jnp.transpose(out, perm).astype(jnp.float32)

    sum_axes = tuple(range(g_n.ndim - 3, g_n.ndim)) + ((0,) if loop_pool else ())
    safe = jnp.where(jnp.abs(gate) > 1e-8, gate, 1.0)
    g_gate = jnp.where(
        jnp.abs(gate) > 1e-8,
        jnp.sum(g_n * out_n, axis=sum_axes) / safe,
        0.0,
    ).astype(gate.dtype)

    def pool_fn(f):
        fs = jax.lax.slice_in_dim(f, c_base, c_base + c_take, axis=-1)
        per_img = []
        for bi in range(b):
            def one_branch(br):
                if loop_pool:
                    return roi_loop_pool(
                        fs[br * b + bi], rois[bi], output_size, spatial_scale,
                        context_ratio=context_ratio,
                    )  # [3, N, P, P, CT]
                return roi_pool(
                    fs[br * b + bi], rois[bi], output_size, spatial_scale
                )

            pooled_all = jnp.stack([one_branch(br) for br in range(n_br)])
            sel = branch[bi]
            if loop_pool:
                sel = sel[None, None, :, None, None, None]
            else:
                sel = sel[None, :, None, None, None]
            per_img.append(jnp.take_along_axis(pooled_all, sel, axis=0)[0])
        stacked = jnp.stack(per_img, axis=1 if loop_pool else 0)
        gx = gate[:, :, None, None, None].astype(stacked.dtype)
        return stacked * (gx[None] if loop_pool else gx)

    _, vjp = jax.vjp(pool_fn, feat)
    (g_feat,) = vjp(g_n.astype(feat.dtype))
    return g_feat, None, g_gate, jnp.zeros_like(branch_f)


roi_pool_fused_branched_ad.defvjp(_pool_branched_fwd, _pool_branched_bwd)
