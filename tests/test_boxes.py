import jax.numpy as jnp
import numpy as np
import pytest

from wsovod_tpu.structures import (
    apply_deltas,
    apply_deltas_linear,
    box_area,
    clip_boxes,
    get_deltas,
    get_deltas_linear,
    matched_pairwise_iou,
    nonempty_boxes,
    pairwise_iou,
    pairwise_iou_wsl,
)


def test_area_clip_nonempty():
    b = jnp.array([[0, 0, 10, 20], [5, 5, 5, 9], [-5, -5, 4, 4]], dtype=jnp.float32)
    np.testing.assert_allclose(box_area(b), [200.0, 0.0, 81.0])
    c = clip_boxes(b, (8, 8))
    np.testing.assert_allclose(c[2], [0, 0, 4, 4])
    np.testing.assert_array_equal(nonempty_boxes(b), [True, False, True])


def test_pairwise_iou_golden():
    a = jnp.array([[0, 0, 10, 10]], dtype=jnp.float32)
    b = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], dtype=jnp.float32)
    iou = pairwise_iou(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 25.0 / 175.0, 0.0], rtol=1e-6)


def test_pairwise_iou_zero_padding_safe():
    a = jnp.zeros((3, 4))
    b = jnp.array([[0, 0, 10, 10]], dtype=jnp.float32)
    assert not np.any(np.isnan(np.asarray(pairwise_iou(a, b))))


def test_pairwise_iou_wsl_sign():
    a = jnp.array([[0, 0, 10, 10]], dtype=jnp.float32)
    b = jnp.array([[2, 2, 8, 8], [20, 0, 30, 10]], dtype=jnp.float32)
    v = pairwise_iou_wsl(a, b)
    # overlapping inner box: positive ratio inner/outer = 36/100
    np.testing.assert_allclose(v[0, 0], 36.0 / 100.0, rtol=1e-6)
    # disjoint along x: negative
    assert v[0, 1] < 0


def test_deltas_roundtrip():
    rng = np.random.RandomState(0)
    src = rng.uniform(0, 50, (20, 2))
    src = np.concatenate([src, src + rng.uniform(5, 60, (20, 2))], axis=1).astype(np.float32)
    tgt = rng.uniform(0, 50, (20, 2))
    tgt = np.concatenate([tgt, tgt + rng.uniform(5, 60, (20, 2))], axis=1).astype(np.float32)
    w = (10.0, 10.0, 5.0, 5.0)
    d = get_deltas(jnp.asarray(src), jnp.asarray(tgt), weights=w)
    rec = apply_deltas(d, jnp.asarray(src), weights=w)
    np.testing.assert_allclose(np.asarray(rec), tgt, rtol=1e-3, atol=5e-3)


def test_deltas_linear_roundtrip():
    rng = np.random.RandomState(1)
    src = rng.uniform(0, 50, (10, 2))
    src = np.concatenate([src, src + rng.uniform(5, 60, (10, 2))], axis=1).astype(np.float32)
    # targets containing the src centers (so distances are positive)
    cx = (src[:, 0] + src[:, 2]) / 2
    cy = (src[:, 1] + src[:, 3]) / 2
    tgt = np.stack([cx - 5, cy - 7, cx + 3, cy + 11], axis=1).astype(np.float32)
    d = get_deltas_linear(jnp.asarray(src), jnp.asarray(tgt))
    rec = apply_deltas_linear(d, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(rec), tgt, rtol=1e-4, atol=1e-3)


def test_matched_iou():
    a = jnp.array([[0, 0, 10, 10], [0, 0, 4, 4]], dtype=jnp.float32)
    v = matched_pairwise_iou(a, a)
    np.testing.assert_allclose(v, [1.0, 1.0])


@pytest.mark.parametrize("k", [1, 3])
def test_apply_deltas_multiclass(k):
    src = jnp.array([[0, 0, 10, 10]], dtype=jnp.float32)
    deltas = jnp.zeros((1, 4 * k))
    out = apply_deltas(deltas, src)
    assert out.shape == (1, 4 * k)
    np.testing.assert_allclose(out.reshape(1, k, 4)[0, 0], [0, 0, 10, 10], atol=1e-5)


def test_torchvision_parity_iou():
    """Cross-check pairwise_iou against torchvision's box_iou."""
    torch = pytest.importorskip("torch")
    tv = pytest.importorskip("torchvision.ops")
    rng = np.random.RandomState(3)
    a = rng.uniform(0, 100, (50, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:] - a[:, :2])
    b = rng.uniform(0, 100, (40, 4)).astype(np.float32)
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:] - b[:, :2])
    ours = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    ref = tv.box_iou(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
