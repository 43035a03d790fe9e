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


def test_roi_pool_torchvision_parity():
    torch = pytest.importorskip("torch")
    tv = pytest.importorskip("torchvision.ops")
    rng = np.random.RandomState(0)
    feat, rois = _rand_feat_rois(rng)
    scale = 0.5
    ours = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 7, scale))
    t_feat = torch.from_numpy(feat).permute(2, 0, 1)[None]  # NCHW
    t_rois = torch.cat([torch.zeros(len(rois), 1), torch.from_numpy(rois)], dim=1)
    ref = tv.roi_pool(t_feat, t_rois, (7, 7), scale).numpy()  # [N, C, 7, 7]
    ref = np.transpose(ref, (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_roi_align_torchvision_parity():
    torch = pytest.importorskip("torch")
    tv = pytest.importorskip("torchvision.ops")
    rng = np.random.RandomState(1)
    feat, rois = _rand_feat_rois(rng)
    scale = 0.5
    ours = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, scale, sampling_ratio=2, aligned=True)
    )
    t_feat = torch.from_numpy(feat).permute(2, 0, 1)[None]
    t_rois = torch.cat([torch.zeros(len(rois), 1), torch.from_numpy(rois)], dim=1)
    ref = tv.roi_align(t_feat, t_rois, (7, 7), scale, sampling_ratio=2, aligned=True).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


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
