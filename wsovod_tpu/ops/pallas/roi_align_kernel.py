"""Pallas TPU kernel for ROIAlign (bilinear, torchvision-V2 semantics).

The XLA gather formulation reads every sampled feature pixel independently
(49 bins x 4 samples x 4 corners x C per ROI ~ 3.2 MB/ROI at C=2048) and
measures ~15% of HBM peak. This kernel instead DMAs each ROI's feature
WINDOW once (typically ~1 MB/ROI) into VMEM and does the bilinear blending
on-chip:

  grid = (c_tiles, roi_blocks); the feature map stays in HBM (`pl.ANY`);
  per ROI a [WIN, WIN, C_TILE] window is copied with a double-buffered async
  DMA while the previous ROI computes; y-blend pairs window rows per sample
  row, x-blend extracts the two window columns per sample column, and the
  S x S samples average into the [P, P, C_TILE] output.

Window cap: WIN pixels (default 32). ROIs whose bin span exceeds the window
are sampled with coordinates clamped into the window — approximate for ROIs
larger than ~WIN feature px (= 8*WIN image px at stride 8), exact otherwise
(the same capping convention as the exact-pool kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sample_meta(coord, lim, win, origin):
    """Bilinear metadata for sample coords clamped into [origin, origin+win).

    coord: [K] float sample positions (feature coords, may be out of range).
    Returns (lo_rel, hi_rel, w_lo, w_hi, ok) — window-relative int indices.
    """
    ok = jnp.logical_and(coord >= -1.0, coord <= lim)
    c = jnp.clip(coord, 0.0, lim - 1.0)
    lo = jnp.floor(c)
    hi = jnp.minimum(lo + 1.0, lim - 1.0)
    w_hi = c - lo
    lo_rel = jnp.clip(lo.astype(jnp.int32) - origin, 0, win - 1)
    hi_rel = jnp.clip(hi.astype(jnp.int32) - origin, 0, win - 1)
    return lo_rel, hi_rel, (1.0 - w_hi), w_hi, ok


def _roi_align_kernel(
    rois_ref,  # [N, 4] SMEM (scalar prefetch)
    feat_hbm,  # [H, W, C] ANY/HBM (full array; channel tile sliced in the DMA)
    out_ref,  # [RB, P, P, CT] VMEM
    win_buf,  # [2, WIN, WIN, CT] VMEM scratch (double buffer)
    sems,  # DMA semaphores (2,)
    *,
    p: int,
    s: int,
    spatial_scale: float,
    win: int,
    roi_block: int,
    h_lim: int,
    w_lim: int,
    c_tile: int,
    ext_lo: float = -1.0,
    ext_hi: float = 1e30,
    full_frame: bool = False,
    w_dma: int = 0,
):
    ct_idx = pl.program_id(0)
    rb = pl.program_id(1)
    c_start = ct_idx * c_tile

    def roi_coords(r):
        # rois are flattened to 1-D for SMEM (a 2-D scalar-prefetch array
        # pads its trailing dim to 128 and overflows SMEM at 5k ROIs)
        x1 = rois_ref[r * 4 + 0] * spatial_scale - 0.5
        y1 = rois_ref[r * 4 + 1] * spatial_scale - 0.5
        x2 = rois_ref[r * 4 + 2] * spatial_scale - 0.5
        y2 = rois_ref[r * 4 + 3] * spatial_scale - 0.5
        return x1, y1, x2, y2

    # full_frame: the window IS the whole feature tile -> exact for any ROI.
    # Windowed: x slices must START and be SIZED in multiples of 8 (sublane
    # tiling), so the feature is padded to w_dma (multiple of 8) by the
    # wrapper and win_x = win + 8 absorbs the align-down of the origin. The
    # y margin (+8 rows) keeps ceil(y2)+1 inside the window for every
    # in-bucket ROI, including the bucket-overlap band.
    win_y = h_lim if full_frame else min(win + 8, h_lim)
    win_x = w_lim if full_frame else win + 8

    def window_origin(r):
        if full_frame:
            zero = jnp.int32(0)
            return zero, pl.multiple_of(zero, 8)
        x1, y1, x2, y2 = roi_coords(r)
        y0 = jnp.clip(jnp.floor(y1).astype(jnp.int32), 0, max(h_lim - win_y, 0))
        # w_dma - win_x is a multiple of 8, so the right-edge clamp survives
        # the align-down intact and the window reaches the last column
        x0 = jnp.clip(jnp.floor(x1).astype(jnp.int32), 0, max(w_dma - win_x, 0))
        x0 = pl.multiple_of((x0 // 8) * 8, 8)
        return y0, x0

    def in_bucket(r):
        x1, y1, x2, y2 = roi_coords(r)
        ext = jnp.maximum(x2 - x1, y2 - y1)
        return jnp.logical_and(ext > ext_lo, ext <= ext_hi)

    def _dma(slot, r):
        y0, x0 = window_origin(r)
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(y0, win_y), pl.ds(x0, win_x), pl.ds(c_start, c_tile)],
            win_buf.at[slot],
            sems.at[slot],
        )

    def start_dma(slot, r):
        if full_frame:
            return  # feature block arrives via the BlockSpec pipeline
        @pl.when(in_bucket(r))
        def _():
            _dma(slot, r).start()

    def wait_dma(slot, r):
        if full_frame:
            return
        @pl.when(in_bucket(r))
        def _():
            _dma(slot, r).wait()

    def row_at(slot, idx):
        # full_frame: feat_hbm IS the resident [H, W, CT] VMEM block
        return feat_hbm[idx] if full_frame else win_buf[slot, idx]

    # warm up: first ROI's window
    start_dma(0, rb * roi_block)

    k = p * s
    grid_k = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0].astype(jnp.float32)
    ph_of_k = jnp.floor(grid_k / s)
    sub_of_k = (grid_k - ph_of_k * s + 0.5) / s

    for i in range(roi_block):
        r = rb * roi_block + i
        slot = i % 2

        @pl.when(i + 1 < roi_block)
        def _():
            start_dma((i + 1) % 2, r + 1)

        wait_dma(slot, r)

        x1, y1, x2, y2 = roi_coords(r)
        take = in_bucket(r)
        bin_h = (y2 - y1) / p
        bin_w = (x2 - x1) / p
        y0, x0 = window_origin(r)

        # sample positions for flat index k = ph*s + sub:
        ys = y1 + (ph_of_k + sub_of_k) * bin_h
        xs = x1 + (ph_of_k + sub_of_k) * bin_w

        if not full_frame:
            # ROIs larger than the window are RESAMPLED into it (uniform
            # downscale of the sample grid) instead of clamped — a bilinear
            # approximation of pooling the downscaled ROI. (Unused by the
            # exact multi-pass entry point, whose last pass is full_frame.)
            # a window that reaches the array edge clamps samples exactly
            # like the reference (no resampling needed beyond it)
            span_y = jnp.where(
                y0 + win_y >= h_lim,
                jnp.float32(1e9),
                (y0 + win_y - 2).astype(jnp.float32) - y1,
            )
            span_x = jnp.where(
                x0 + win_x >= w_lim,
                jnp.float32(1e9),
                (x0 + win_x - 2).astype(jnp.float32) - x1,
            )
            sy_fac = jnp.minimum(1.0, span_y / jnp.maximum(y2 - y1, 1e-6))
            sx_fac = jnp.minimum(1.0, span_x / jnp.maximum(x2 - x1, 1e-6))
            ys = y1 + (ys - y1) * sy_fac
            xs = x1 + (xs - x1) * sx_fac

        ylo, yhi, wy0, wy1, yok = _sample_meta(ys, float(h_lim), win_y, y0)
        xlo, xhi, wx0, wx1, xok = _sample_meta(xs, float(w_lim), win_x, x0)
        # scalar extraction of bools is unsupported on the scalar core —
        # fold y-validity into the y weights instead
        yok_f = yok.astype(jnp.float32)
        wy0 = wy0 * yok_f
        wy1 = wy1 * yok_f

        ct = out_ref.shape[-1]

        # x-interpolation as ONE one-hot-weighted matrix (shared by all
        # sample rows): Wx[k, win] has wx0 at xlo and wx1 at xhi, so
        # samples = Wx @ row runs on the MXU instead of a per-column loop.
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (k, win_x), 1)
        wx_mat = (
            jnp.where(col_iota == xlo[:, None], wx0[:, None], 0.0)
            + jnp.where(col_iota == xhi[:, None], wx1[:, None], 0.0)
        ) * xok[:, None].astype(jnp.float32)  # [k, win]

        def body(acc_ref):
            @pl.when(take)
            def _():
                for kk in range(k):  # p*s sample rows (static unroll)
                    row = (
                        row_at(slot, ylo[kk]).astype(jnp.float32) * wy0[kk]
                        + row_at(slot, yhi[kk]).astype(jnp.float32) * wy1[kk]
                    )  # [win, CT]
                    samples = jnp.dot(
                        wx_mat, row, preferred_element_type=jnp.float32,
                        precision=(
                            jax.lax.Precision.HIGHEST
                            if feat_hbm.dtype == jnp.float32
                            else jax.lax.Precision.DEFAULT
                        ),
                    )  # [k, CT]
                    # sum the s sub-columns of each bin: [p, s, CT] -> [p, CT]
                    contrib = samples.reshape(p, s, ct).sum(axis=1)
                    ph = kk // s
                    if kk % s == 0:
                        acc_ref[ph] = contrib
                    else:
                        acc_ref[ph] += contrib
                out_ref[i] = (acc_ref[...] / float(s * s)).astype(out_ref.dtype)

        pl.run_scoped(body, pltpu.VMEM((p, p, ct), jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size", "spatial_scale", "sampling_ratio", "win", "c_tile",
        "roi_block", "interpret", "ext_lo", "ext_hi", "full_frame",
    ),
)
def roi_align_pallas(
    feat: jnp.ndarray,  # [H, W, C]
    rois: jnp.ndarray,  # [N, 4]
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    win: int = 32,
    c_tile: int = 512,
    roi_block: int = 8,
    interpret: bool = False,
    ext_lo: float = -1.0,
    ext_hi: float = 1e30,
    full_frame: bool = False,
) -> jnp.ndarray:
    h, w, c = feat.shape
    p = output_size
    s = max(sampling_ratio, 1)
    n = rois.shape[0]
    pad = (-n) % roi_block
    rois_p = jnp.pad(rois.astype(jnp.float32), ((0, pad), (0, 0)))
    n_pad = rois_p.shape[0]
    c_tile = min(c_tile, c)
    assert c % c_tile == 0
    if not full_frame:
        win = min(win, h, max(w - 8, 8))
        assert win % 8 == 0 or win == max(w - 8, 8) or win == h, win
    w_dma = -(-w // 8) * 8
    if not full_frame and w_dma != w:
        feat = jnp.pad(feat, ((0, 0), (0, w_dma - w), (0, 0)))
    win_y = h if full_frame else min(win + 8, h)
    win_x = w if full_frame else win + 8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c // c_tile, n_pad // roi_block),
        in_specs=[
            # full_frame: the whole spatial tile (one channel tile) rides the
            # BlockSpec pipeline into VMEM — no manual DMA, no 8-alignment
            # constraint on W. Otherwise ANY-space whole-array (the window
            # is DMA'd manually; Mosaic requires 8-aligned manual slices).
            pl.BlockSpec((h, w, c_tile), lambda ct, rb, rois_s: (0, 0, ct))
            if full_frame
            else pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (roi_block, p, p, c_tile), lambda ct, rb, rois_s: (rb, 0, 0, ct)
        ),
        scratch_shapes=[
            # full_frame never touches the window buffer; keep it minimal
            pltpu.VMEM(
                (2, 8, 8, c_tile) if full_frame else (2, win_y, win_x, c_tile),
                feat.dtype,
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _roi_align_kernel,
        p=p,
        s=s,
        spatial_scale=spatial_scale,
        win=win,
        roi_block=roi_block,
        h_lim=h,
        w_lim=w,
        c_tile=c_tile,
        ext_lo=ext_lo,
        ext_hi=ext_hi,
        full_frame=full_frame,
        w_dma=w_dma,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, p, p, c), feat.dtype),
        interpret=interpret,
    )(rois_p.reshape(-1), feat)
    return out[:n]


def _roi_align_kernel_ab(
    rois_ref,  # [N*4] SMEM (scalar prefetch)
    feat_hbm,  # [H, W_dma, C] ANY/HBM
    out_ref,  # [RB, P, P, CT] VMEM
    buf_a,  # [2, WIN_YA, WIN_XA, CT] VMEM scratch (small-ROI windows)
    buf_b,  # [2, WIN_YB, WIN_XB, CT] VMEM scratch (mid-ROI windows)
    sem_a,  # DMA semaphores (2,)
    sem_b,  # DMA semaphores (2,)
    *,
    p: int,
    s: int,
    spatial_scale: float,
    win_a: int,
    win_b: int,
    roi_block: int,
    h_lim: int,
    w_lim: int,
    c_tile: int,
    e_mid: float,
    e_hi: float,
    w_dma: int,
):
    """Fused small+mid bucket ROIAlign: one grid pass, one output buffer.

    Each ROI classifies as small (ext <= e_mid, window win_a), mid
    (e_mid < ext <= e_hi, window win_b) or neither (skipped — the caller's
    full-frame pass owns it). Both window DMAs are predicated, so a ROI pays
    only its own bucket's DMA + compute, and the two buckets share the
    output block (no cross-pass select needed for them)."""
    ct_idx = pl.program_id(0)
    rb = pl.program_id(1)
    c_start = ct_idx * c_tile

    def roi_coords(r):
        x1 = rois_ref[r * 4 + 0] * spatial_scale - 0.5
        y1 = rois_ref[r * 4 + 1] * spatial_scale - 0.5
        x2 = rois_ref[r * 4 + 2] * spatial_scale - 0.5
        y2 = rois_ref[r * 4 + 3] * spatial_scale - 0.5
        return x1, y1, x2, y2

    def ext_of(r):
        x1, y1, x2, y2 = roi_coords(r)
        return jnp.maximum(x2 - x1, y2 - y1)

    def is_small(r):
        return ext_of(r) <= e_mid

    def is_mid(r):
        e = ext_of(r)
        return jnp.logical_and(e > e_mid, e <= e_hi)

    win_ya = min(win_a + 8, h_lim)
    win_xa = win_a + 8
    win_yb = min(win_b + 8, h_lim)
    win_xb = win_b + 8

    def origin(r, win_y, win_x):
        x1, y1, _, _ = roi_coords(r)
        y0 = jnp.clip(jnp.floor(y1).astype(jnp.int32), 0, max(h_lim - win_y, 0))
        x0 = jnp.clip(jnp.floor(x1).astype(jnp.int32), 0, max(w_dma - win_x, 0))
        x0 = pl.multiple_of((x0 // 8) * 8, 8)
        return y0, x0

    def start_dma(slot, r):
        @pl.when(is_small(r))
        def _():
            y0, x0 = origin(r, win_ya, win_xa)
            pltpu.make_async_copy(
                feat_hbm.at[
                    pl.ds(y0, win_ya), pl.ds(x0, win_xa), pl.ds(c_start, c_tile)
                ],
                buf_a.at[slot],
                sem_a.at[slot],
            ).start()

        @pl.when(is_mid(r))
        def _():
            y0, x0 = origin(r, win_yb, win_xb)
            pltpu.make_async_copy(
                feat_hbm.at[
                    pl.ds(y0, win_yb), pl.ds(x0, win_xb), pl.ds(c_start, c_tile)
                ],
                buf_b.at[slot],
                sem_b.at[slot],
            ).start()

    def wait_dma(slot, r):
        @pl.when(is_small(r))
        def _():
            pltpu.make_async_copy(
                feat_hbm.at[pl.ds(0, win_ya), pl.ds(0, win_xa), pl.ds(0, c_tile)],
                buf_a.at[slot],
                sem_a.at[slot],
            ).wait()

        @pl.when(is_mid(r))
        def _():
            pltpu.make_async_copy(
                feat_hbm.at[pl.ds(0, win_yb), pl.ds(0, win_xb), pl.ds(0, c_tile)],
                buf_b.at[slot],
                sem_b.at[slot],
            ).wait()

    start_dma(0, rb * roi_block)

    k = p * s
    grid_k = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0].astype(jnp.float32)
    ph_of_k = jnp.floor(grid_k / s)
    sub_of_k = (grid_k - ph_of_k * s + 0.5) / s
    ct = c_tile

    for i in range(roi_block):
        r = rb * roi_block + i
        slot = i % 2

        @pl.when(i + 1 < roi_block)
        def _():
            start_dma((i + 1) % 2, r + 1)

        wait_dma(slot, r)

        x1, y1, x2, y2 = roi_coords(r)
        bin_h = (y2 - y1) / p
        bin_w = (x2 - x1) / p
        ys = y1 + (ph_of_k + sub_of_k) * bin_h
        xs = x1 + (ph_of_k + sub_of_k) * bin_w

        def bucket_body(buf, win_y, win_x, y0, x0, acc_ref):
            ylo, yhi, wy0, wy1, yok = _sample_meta(ys, float(h_lim), win_y, y0)
            xlo, xhi, wx0, wx1, xok = _sample_meta(xs, float(w_lim), win_x, x0)
            yok_f = yok.astype(jnp.float32)
            wy0l = wy0 * yok_f
            wy1l = wy1 * yok_f
            col_iota = jax.lax.broadcasted_iota(jnp.int32, (k, win_x), 1)
            wx_mat = (
                jnp.where(col_iota == xlo[:, None], wx0[:, None], 0.0)
                + jnp.where(col_iota == xhi[:, None], wx1[:, None], 0.0)
            ) * xok[:, None].astype(jnp.float32)
            for kk in range(k):
                row = (
                    buf[slot, ylo[kk]].astype(jnp.float32) * wy0l[kk]
                    + buf[slot, yhi[kk]].astype(jnp.float32) * wy1l[kk]
                )
                samples = jnp.dot(
                    wx_mat, row, preferred_element_type=jnp.float32,
                    precision=(
                        jax.lax.Precision.HIGHEST
                        if buf.dtype == jnp.float32
                        else jax.lax.Precision.DEFAULT
                    ),
                )
                contrib = samples.reshape(p, s, ct).sum(axis=1)
                ph = kk // s
                if kk % s == 0:
                    acc_ref[ph] = contrib
                else:
                    acc_ref[ph] += contrib
            out_ref[i] = (acc_ref[...] / float(s * s)).astype(out_ref.dtype)

        def body(acc_ref):
            @pl.when(is_small(r))
            def _():
                y0, x0 = origin(r, win_ya, win_xa)
                bucket_body(buf_a, win_ya, win_xa, y0, x0, acc_ref)

            @pl.when(is_mid(r))
            def _():
                y0, x0 = origin(r, win_yb, win_xb)
                bucket_body(buf_b, win_yb, win_xb, y0, x0, acc_ref)

        pl.run_scoped(body, pltpu.VMEM((p, p, ct), jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size", "spatial_scale", "sampling_ratio", "win_a", "win_b",
        "c_tile", "roi_block", "interpret", "e_mid", "e_hi",
    ),
)
def roi_align_pallas_ab(
    feat: jnp.ndarray,  # [H, W, C]
    rois: jnp.ndarray,  # [N, 4]
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    win_a: int = 16,
    win_b: int = 48,
    c_tile: int = 512,
    roi_block: int = 8,
    interpret: bool = False,
    e_mid: float = 14.0,
    e_hi: float = 44.5,
) -> jnp.ndarray:
    h, w, c = feat.shape
    p = output_size
    s = max(sampling_ratio, 1)
    n = rois.shape[0]
    pad = (-n) % roi_block
    rois_p = jnp.pad(rois.astype(jnp.float32), ((0, pad), (0, 0)))
    n_pad = rois_p.shape[0]
    c_tile = min(c_tile, c)
    assert c % c_tile == 0
    w_dma = -(-w // 8) * 8
    if w_dma != w:
        feat = jnp.pad(feat, ((0, 0), (0, w_dma - w), (0, 0)))
    win_ya, win_xa = min(win_a + 8, h), win_a + 8
    win_yb, win_xb = min(win_b + 8, h), win_b + 8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c // c_tile, n_pad // roi_block),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (roi_block, p, p, c_tile), lambda ct, rb, rois_s: (rb, 0, 0, ct)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win_ya, win_xa, c_tile), feat.dtype),
            pltpu.VMEM((2, win_yb, win_xb, c_tile), feat.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _roi_align_kernel_ab,
        p=p,
        s=s,
        spatial_scale=spatial_scale,
        win_a=win_a,
        win_b=win_b,
        roi_block=roi_block,
        h_lim=h,
        w_lim=w,
        c_tile=c_tile,
        e_mid=e_mid,
        e_hi=e_hi,
        w_dma=w_dma,
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
        "output_size", "spatial_scale", "sampling_ratio", "c_tile", "roi_block",
        "interpret",
    ),
)
def roi_align_pallas_exact(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    c_tile: int = 512,
    roi_block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """EXACT multi-pass variant: three size buckets (window 16 / 48 /
    full-frame) run the same kernel with per-ROI predicates, so each ROI pays
    only its own bucket's DMA + compute; results select by size. The
    full-frame pass covers arbitrarily large ROIs exactly (the window IS the
    feature tile)."""
    h, w, c = feat.shape
    scale = spatial_scale
    ext = jnp.maximum(
        (rois[:, 2] - rois[:, 0]) * scale, (rois[:, 3] - rois[:, 1]) * scale
    )
    # bucket edges in feature px; window must cover ext + 1 (bilinear hi) + 8
    # (x alignment slack). The kernel computes ext with a DIFFERENT fp
    # expression ((x*scale-0.5) differences), so kernel buckets OVERLAP by
    # +-0.5: whichever side of an edge the selector lands on, that pass
    # definitely processed the ROI.
    e1, e2 = 14.0, 44.0
    common = dict(
        output_size=output_size, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio, c_tile=c_tile, roi_block=roi_block,
        interpret=interpret,
    )
    # fused small+mid pass shares one output block (in-kernel bucketing), so
    # only ONE select against the full-frame pass remains
    ab = roi_align_pallas_ab(
        feat, rois, win_a=16, win_b=48, e_mid=e1, e_hi=e2 + 0.5, **common
    )
    # full-frame pass: window = whole feature tile; shrink the channel tile
    # so the double-buffered scratch fits VMEM (2*H*W*ct*bytes <= ~8MB)
    itemsize = 2 if feat.dtype == jnp.bfloat16 else 4
    ct_full = c_tile
    while ct_full > 128 and 2 * h * w * ct_full * itemsize > 8 * 1024 * 1024:
        ct_full //= 2
    common_full = dict(common, c_tile=ct_full)
    full = roi_align_pallas(
        feat, rois, full_frame=True, ext_lo=e2 - 0.5, ext_hi=1e30, **common_full
    )
    sel = ext[:, None, None, None]
    out = jnp.where(sel <= e2, ab, full)
    return out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4)
)
def roi_align_pallas_exact_ad(
    feat, rois, output_size=7, spatial_scale=1.0, sampling_ratio=2
):
    """Differentiable wrapper: Pallas exact kernel forward, gather-path VJP
    backward (only taken when the backbone is unfrozen; the frozen-backbone
    training path stop-gradients the features so backward never runs)."""
    return roi_align_pallas_exact(
        feat, rois, output_size=output_size, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio,
    )


def _ra_exact_fwd(feat, rois, output_size, spatial_scale, sampling_ratio):
    out = roi_align_pallas_exact(
        feat, rois, output_size=output_size, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio,
    )
    return out, (feat, rois)


def _ra_exact_bwd(output_size, spatial_scale, sampling_ratio, res, g):
    from ..roi_pool import roi_align

    feat, rois = res
    _, vjp = jax.vjp(
        lambda f, r: roi_align(
            f, r, output_size=output_size, spatial_scale=spatial_scale,
            sampling_ratio=sampling_ratio,
        ),
        feat, rois,
    )
    return vjp(g)


roi_align_pallas_exact_ad.defvjp(_ra_exact_fwd, _ra_exact_bwd)
