import jax.numpy as jnp
import numpy as np
import pytest

from wsovod_tpu.ops.roi_pool import roi_align, roi_loop_pool, roi_pool


def _rand_feat_rois(rng, h=24, w=32, c=8, n=12, img_scale=2.0):
    feat = rng.uniform(0, 1, (h, w, c)).astype(np.float32)  # >= 0 like post-ReLU
    xy = rng.uniform(0, w * img_scale * 0.7, (n, 1)) , rng.uniform(0, h * img_scale * 0.7, (n, 1))
    x1 = rng.uniform(0, w * img_scale * 0.7, (n, 1))
    y1 = rng.uniform(0, h * img_scale * 0.7, (n, 1))
    x2 = x1 + rng.uniform(2, w * img_scale * 0.3, (n, 1))
    y2 = y1 + rng.uniform(2, h * img_scale * 0.3, (n, 1))
    rois = np.concatenate([x1, y1, x2, y2], axis=1).astype(np.float32)
    return feat, rois


def _naive_roi_pool(feat, rois, pooled, scale):
    """Direct python port of torchvision RoIPool semantics for goldens."""
    H, W, C = feat.shape
    out = np.zeros((len(rois), pooled, pooled, C), np.float32)
    for n, (x1, y1, x2, y2) in enumerate(rois):
        rx1, ry1 = int(round(x1 * scale)), int(round(y1 * scale))
        rx2, ry2 = int(round(x2 * scale)), int(round(y2 * scale))
        rw, rh = max(rx2 - rx1 + 1, 1), max(ry2 - ry1 + 1, 1)
        for ph in range(pooled):
            for pw in range(pooled):
                hs = min(max(int(np.floor(ph * rh / pooled)) + ry1, 0), H)
                he = min(max(int(np.ceil((ph + 1) * rh / pooled)) + ry1, 0), H)
                ws = min(max(int(np.floor(pw * rw / pooled)) + rx1, 0), W)
                we = min(max(int(np.ceil((pw + 1) * rw / pooled)) + rx1, 0), W)
                if he > hs and we > ws:
                    out[n, ph, pw] = feat[hs:he, ws:we].max(axis=(0, 1))
    return out


def _naive_roi_align(feat, rois, pooled, scale, ratio, aligned):
    """Direct python port of torchvision ROIAlign (V2 when aligned)."""
    H, W, C = feat.shape
    off = 0.5 if aligned else 0.0
    out = np.zeros((len(rois), pooled, pooled, C), np.float32)

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C, np.float32)
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - ly) * (1 - lx)
            + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx)
            + feat[y1, x1] * ly * lx
        )

    for n, (bx1, by1, bx2, by2) in enumerate(rois):
        x1, y1 = bx1 * scale - off, by1 * scale - off
        x2, y2 = bx2 * scale - off, by2 * scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / pooled, rh / pooled
        for ph in range(pooled):
            for pw in range(pooled):
                acc = np.zeros(C, np.float32)
                for sy in range(ratio):
                    for sx in range(ratio):
                        yy = y1 + (ph + (sy + 0.5) / ratio) * bh
                        xx = x1 + (pw + (sx + 0.5) / ratio) * bw
                        acc += bilinear(yy, xx)
                out[n, ph, pw] = acc / (ratio * ratio)
    return out


def test_roi_pool_naive_parity():
    rng = np.random.RandomState(0)
    feat, rois = _rand_feat_rois(rng)
    scale = 0.5
    ours = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 7, scale))
    ref = _naive_roi_pool(feat, rois, 7, scale)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_roi_align_naive_parity():
    rng = np.random.RandomState(1)
    feat, rois = _rand_feat_rois(rng)
    scale = 0.5
    ours = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, scale, sampling_ratio=2, aligned=True)
    )
    ref = _naive_roi_align(feat, rois, 7, scale, 2, True)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_roi_align_chunking_consistent():
    rng = np.random.RandomState(2)
    feat, rois = _rand_feat_rois(rng, n=12)
    a = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 0.5, roi_chunk=4))
    b = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 0.5, roi_chunk=512))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def _naive_loop_pool(feat_hwc, rois, pooled, scale, context_ratio=1.8):
    """Direct python port of the reference CUDA semantics
    (ROILoopPool_cuda.cu:10-203) for golden testing."""
    H, W, C = feat_hwc.shape
    N = len(rois)
    out = np.zeros((3, N, pooled, pooled, C), dtype=np.float32)
    for n in range(N):
        x1, y1, x2, y2 = rois[n]
        rw, rh = x2 - x1, y2 - y1
        in_res_w, in_res_h = (rw - rw / context_ratio) / 2, (rh - rh / context_ratio) / 2
        out_res_w, out_res_h = (rw * context_ratio - rw) / 2, (rh * context_ratio - rh) / 2
        clipf = lambda v, lim: min(max(v, 0.0), lim / scale)
        xi1, yi1 = clipf(x1 + in_res_w, W), clipf(y1 + in_res_h, H)
        xi2, yi2 = clipf(x2 - in_res_w, W), clipf(y2 - in_res_h, H)
        xo1, yo1 = clipf(x1 - out_res_w, W), clipf(y1 - out_res_h, H)
        xo2, yo2 = clipf(x2 + out_res_w, W), clipf(y2 + out_res_h, H)

        def pool(box, hole, out_idx):
            bx1, by1, bx2, by2 = [int(round(v * scale)) for v in box]
            hx1, hy1, hx2, hy2 = (
                [int(round(v * scale)) for v in hole] if hole else [0, 0, -1, -1]
            )
            bw = max(bx2 - bx1 + 1, 1)
            bh = max(by2 - by1 + 1, 1)
            for ph in range(pooled):
                for pw in range(pooled):
                    hs = min(max(int(np.floor(ph * bh / pooled)) + by1, 0), H)
                    he = min(max(int(np.ceil((ph + 1) * bh / pooled)) + by1, 0), H)
                    ws = min(max(int(np.floor(pw * bw / pooled)) + bx1, 0), W)
                    we = min(max(int(np.ceil((pw + 1) * bw / pooled)) + bx1, 0), W)
                    maxval = np.zeros(C, dtype=np.float32)
                    for h in range(hs, he):
                        for w in range(ws, we):
                            if hole and (hy1 < h < hy2) and (hx1 < w < hx2):
                                continue
                            maxval = np.maximum(maxval, feat_hwc[h, w])
                    out[out_idx, n, ph, pw] = maxval

        pool((x1, y1, x2, y2), None, 0)
        pool((x1, y1, x2, y2), (xi1, yi1, xi2, yi2), 1)
        pool((xo1, yo1, xo2, yo2), (x1, y1, x2, y2), 2)
    return out


def test_roi_loop_pool_golden():
    rng = np.random.RandomState(2)
    feat, rois = _rand_feat_rois(rng, h=16, w=20, c=4, n=6)
    scale = 0.5
    ours = np.asarray(roi_loop_pool(jnp.asarray(feat), jnp.asarray(rois), 7, scale))
    ref = _naive_loop_pool(feat, rois, 7, scale)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_roi_loop_pool_shapes_nonneg():
    rng = np.random.RandomState(3)
    feat, rois = _rand_feat_rois(rng, h=16, w=16, c=4, n=5)
    out = np.asarray(roi_loop_pool(jnp.asarray(feat), jnp.asarray(rois), 7, 0.25))
    assert out.shape == (3, 5, 7, 7, 4)
    assert (out >= 0).all()


def test_roi_pool_empty_and_degenerate_rois():
    feat = jnp.ones((8, 8, 2))
    rois = jnp.array([[0, 0, 0, 0], [100, 100, 120, 120]], jnp.float32)
    out = np.asarray(roi_pool(feat, rois, 7, 1.0))
    assert out.shape == (2, 7, 7, 2)
    assert not np.any(np.isnan(out))
