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

    win_x = win + 8  # x origin is aligned down to the 8-sublane tiling

    def window_origin(r):
        x1, y1, x2, y2 = roi_coords(r)
        y0 = jnp.clip(jnp.floor(y1).astype(jnp.int32), 0, max(h_lim - win, 0))
        x0 = jnp.clip(jnp.floor(x1).astype(jnp.int32), 0, max(w_lim - win_x, 0))
        x0 = pl.multiple_of((x0 // 8) * 8, 8)
        return y0, x0

    def _dma(slot, r):
        y0, x0 = window_origin(r)
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(y0, win), pl.ds(x0, win_x), pl.ds(c_start, c_tile)],
            win_buf.at[slot],
            sems.at[slot],
        )

    def start_dma(slot, r):
        _dma(slot, r).start()

    def wait_dma(slot, r):
        _dma(slot, r).wait()

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
        bin_h = (y2 - y1) / p
        bin_w = (x2 - x1) / p
        y0, x0 = window_origin(r)

        # sample positions for flat index k = ph*s + sub:
        ys = y1 + (ph_of_k + sub_of_k) * bin_h
        xs = x1 + (ph_of_k + sub_of_k) * bin_w

        # ROIs larger than the window are RESAMPLED into it (uniform
        # downscale of the sample grid) instead of clamped — a bilinear
        # approximation of pooling the downscaled ROI.
        span_y = (y0 + win - 2).astype(jnp.float32) - y1
        span_x = (x0 + win_x - 2).astype(jnp.float32) - x1
        sy_fac = jnp.minimum(1.0, span_y / jnp.maximum(y2 - y1, 1e-6))
        sx_fac = jnp.minimum(1.0, span_x / jnp.maximum(x2 - x1, 1e-6))
        ys = y1 + (ys - y1) * sy_fac
        xs = x1 + (xs - x1) * sx_fac

        ylo, yhi, wy0, wy1, yok = _sample_meta(ys, float(h_lim), win, y0)
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
            for kk in range(k):  # p*s sample rows (static unroll)
                row = (
                    win_buf[slot, ylo[kk]].astype(jnp.float32) * wy0[kk]
                    + win_buf[slot, yhi[kk]].astype(jnp.float32) * wy1[kk]
                )  # [win, CT]
                samples = jnp.dot(
                    wx_mat, row, preferred_element_type=jnp.float32
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
        "roi_block", "interpret",
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
    win = min(win, h, max(w - 8, 8))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c // c_tile, n_pad // roi_block),
        in_specs=[
            # ANY-space inputs must be whole-array blocks with a trivial
            # index map; the channel tile is sliced inside the window DMA.
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (roi_block, p, p, c_tile), lambda ct, rb, rois_s: (rb, 0, 0, ct)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win, win + 8, c_tile), feat.dtype),
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
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, p, p, c), feat.dtype),
        interpret=interpret,
    )(rois_p.reshape(-1), feat)
    return out[:n]
