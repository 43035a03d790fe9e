"""Numerical parity vs torch oracles transcribed from the reference formulas.

Each oracle re-implements a reference formula in torch/numpy (NOT imported
from /root/reference — transcribed from the cited lines) and the JAX path is
asserted to match on randomized inputs, including ragged-vs-padded
equivalence. Reference citations:

* WSDDN MIL scores + BCE image loss —
  ``wsovod/modeling/roi_heads/fast_rcnn_open_vocabulary.py:318-437``
* ContextLocNet det branch — ``fast_rcnn_open_vocabulary.py:369-390``
* weighted CE with -1 ignore — ``fast_rcnn_open_vocabulary.py:813-820``
* smooth_l1_weighted box reg — ``fast_rcnn_open_vocabulary.py:822-892``
* d2 Matcher semantics incl. allow_low_quality — d2 ``matcher.py`` as used by
  ``wsovod/modeling/proposal_generator/rpn.py:269-271``
* Box2Box deltas (weights + scale clamp) — d2 ``box_regression.py`` as
  configured by ``MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS``
* get_pgt_top_k — ``wsovod/modeling/roi_heads/roi_heads.py:1042-1215``
* K-head inference averaging — ``fast_rcnn_open_vocabulary.py:894-1017``
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from wsovod_tpu.models.mil_heads import (  # noqa: E402
    InstanceRefinementOutputLayers,
    ObjectMiningOutputLayers,
    predict_boxes_K,
    predict_probs_K,
)
from wsovod_tpu.models.mining import pgt_top_k  # noqa: E402
from wsovod_tpu.ops.matcher import Matcher  # noqa: E402
from wsovod_tpu.structures.boxes import apply_deltas, get_deltas  # noqa: E402


def _rand_boxes(rng, n, span=200.0):
    xy = rng.uniform(0, span, (n, 2))
    wh = rng.uniform(5, 80, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


# --------------------------------------------------------------- MIL / WSDDN
def test_mil_scores_and_bce_loss_oracle():
    rng = np.random.RandomState(0)
    b, pmax, f, c = 3, 12, 16, 5
    counts = [12, 7, 9]  # ragged per-image proposal counts
    x = rng.randn(b, pmax, f).astype(np.float32)
    valid = np.zeros((b, pmax), bool)
    for i, n in enumerate(counts):
        valid[i, :n] = True
    oh = (rng.rand(b, c) > 0.6).astype(np.float32)
    oh[:, 0] = 1.0  # ensure at least one positive

    m = ObjectMiningOutputLayers(num_classes=c, mean_loss=True)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(valid))
    scores = m.apply(params, jnp.asarray(x), jnp.asarray(valid))
    losses = m.losses(scores, jnp.asarray(oh))

    wc = np.asarray(params["params"]["cls"]["kernel"])
    bc = np.asarray(params["params"]["cls"]["bias"])
    wd = np.asarray(params["params"]["det"]["kernel"])
    bd = np.asarray(params["params"]["det"]["bias"])

    # torch oracle on the ragged lists (reference :342-354, :604-618, :392-437)
    img_logits = []
    for i, n in enumerate(counts):
        xt = torch.tensor(x[i, :n])
        C = xt @ torch.tensor(wc) + torch.tensor(bc)
        D = xt @ torch.tensor(wd) + torch.tensor(bd)
        s = F.softmax(C, dim=1) * F.softmax(D, dim=0)
        np.testing.assert_allclose(
            np.asarray(scores[i, :n]), s.numpy(), rtol=2e-5, atol=2e-6
        )
        # padded rows must be exactly zero
        assert np.all(np.asarray(scores[i, n:]) == 0)
        img_logits.append(torch.clamp(s.sum(0, keepdim=True), 1e-6, 1 - 1e-6))
    logits = torch.cat(img_logits)
    want = F.binary_cross_entropy(logits, torch.tensor(oh), reduction="mean")
    np.testing.assert_allclose(
        float(losses["loss_cls_object_mining"]), float(want), rtol=2e-5
    )


def test_contextlocnet_oracle():
    rng = np.random.RandomState(1)
    b, p, f, c = 2, 6, 8, 4
    x = rng.randn(3, b, p, f).astype(np.float32)  # (roi, frame, context)
    valid = np.ones((b, p), bool)

    m = ObjectMiningOutputLayers(num_classes=c, context=True)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(valid))
    scores = m.apply(params, jnp.asarray(x), jnp.asarray(valid))

    wc = torch.tensor(np.asarray(params["params"]["cls"]["kernel"]))
    bc = torch.tensor(np.asarray(params["params"]["cls"]["bias"]))
    wd = torch.tensor(np.asarray(params["params"]["det"]["kernel"]))
    bd = torch.tensor(np.asarray(params["params"]["det"]["bias"]))
    for i in range(b):
        roi, fr, cx = (torch.tensor(x[j, i]) for j in range(3))
        C = roi @ wc + bc
        # reference :390: det(frame) - det(context)
        D = (fr @ wd + bd) - (cx @ wd + bd)
        s = F.softmax(C, dim=1) * F.softmax(D, dim=0)
        np.testing.assert_allclose(np.asarray(scores[i]), s.numpy(), rtol=2e-5, atol=2e-6)


# ----------------------------------------------------- refinement CE + box reg
def _refine_inputs(seed, b=2, p=20, c=6):
    rng = np.random.RandomState(seed)
    scores = rng.randn(b, p, c + 1).astype(np.float32)
    deltas = rng.randn(b, p, 4).astype(np.float32) * 0.2
    pboxes = np.stack([_rand_boxes(rng, p) for _ in range(b)])
    gboxes = np.stack([_rand_boxes(rng, p) for _ in range(b)])
    gt_classes = rng.randint(-1, c + 1, (b, p)).astype(np.int32)
    weights = rng.uniform(0.1, 1.0, (b, p)).astype(np.float32)
    valid = np.ones((b, p), bool)
    return scores, deltas, pboxes, gboxes, gt_classes, weights, valid


def _torch_refine_losses(scores, deltas, pboxes, gboxes, gt_classes, weights,
                         c, reg_w=(10.0, 10.0, 5.0, 5.0)):
    """Oracle for fast_rcnn_open_vocabulary.py:780-892 (flattened batch)."""
    s = torch.tensor(scores.reshape(-1, scores.shape[-1]))
    d = torch.tensor(deltas.reshape(-1, 4))
    pb = torch.tensor(pboxes.reshape(-1, 4))
    gb = torch.tensor(gboxes.reshape(-1, 4))
    gc = torch.tensor(gt_classes.reshape(-1).astype(np.int64))
    w = torch.tensor(weights.reshape(-1)).clone()
    w[gc == -1] = 0.0
    valid_w = (w > 1e-12).float()

    ce = F.cross_entropy(s, gc, reduction="none", ignore_index=-1)
    loss_cls = (ce * w).sum() / valid_w.sum()

    fg = (gc >= 0) & (gc < c)
    src, tgt = pb[fg], gb[fg]
    sw, sh = src[:, 2] - src[:, 0], src[:, 3] - src[:, 1]
    scx, scy = src[:, 0] + 0.5 * sw, src[:, 1] + 0.5 * sh
    tw, th = tgt[:, 2] - tgt[:, 0], tgt[:, 3] - tgt[:, 1]
    tcx, tcy = tgt[:, 0] + 0.5 * tw, tgt[:, 1] + 0.5 * th
    gt_d = torch.stack(
        [
            reg_w[0] * (tcx - scx) / sw,
            reg_w[1] * (tcy - scy) / sh,
            reg_w[2] * torch.log(tw / sw),
            reg_w[3] * torch.log(th / sh),
        ],
        dim=1,
    )
    l1 = torch.abs(d[fg] - gt_d)  # beta = 0 -> pure L1
    loss_reg = (l1 * w[fg, None]).sum() / gc.numel()
    return float(loss_cls), float(loss_reg)


def test_weighted_ce_and_smooth_l1_weighted_oracle():
    c = 6
    scores, deltas, pboxes, gboxes, gt_classes, weights, valid = _refine_inputs(2)
    head = InstanceRefinementOutputLayers(num_classes=c, refine_k=0, refine_reg=True)
    out = head.losses(
        jnp.asarray(scores), jnp.asarray(deltas), jnp.asarray(pboxes),
        jnp.asarray(gt_classes), jnp.asarray(gboxes), jnp.asarray(weights),
        jnp.asarray(valid),
    )
    want_cls, want_reg = _torch_refine_losses(
        scores, deltas, pboxes, gboxes, gt_classes, weights, c
    )
    np.testing.assert_allclose(float(out["loss_cls_r0"]), want_cls, rtol=2e-5)
    np.testing.assert_allclose(float(out["loss_box_reg_r0"]), want_reg, rtol=2e-5)


def test_unweighted_ce_oracle():
    c = 6
    scores, deltas, pboxes, gboxes, gt_classes, weights, valid = _refine_inputs(3)
    head = InstanceRefinementOutputLayers(
        num_classes=c, refine_k=1, refine_reg=False, cross_entropy_weighted=False
    )
    out = head.losses(
        jnp.asarray(scores), jnp.asarray(deltas), jnp.asarray(pboxes),
        jnp.asarray(gt_classes), jnp.asarray(gboxes), jnp.asarray(weights),
        jnp.asarray(valid),
    )
    s = torch.tensor(scores.reshape(-1, c + 1))
    gc = torch.tensor(gt_classes.reshape(-1).astype(np.int64))
    want = F.cross_entropy(s, gc, reduction="mean", ignore_index=-1)
    np.testing.assert_allclose(float(out["loss_cls_r1"]), float(want), rtol=2e-5)


# ----------------------------------------------------------------- Matcher
def _d2_matcher_oracle(quality, thresholds, labels, allow_low_quality):
    """Transcription of d2 Matcher.__call__ + set_low_quality_matches_."""
    q = torch.tensor(quality)
    matched_vals, matches = q.max(dim=0)
    match_labels = matches.new_full(matches.size(), 1, dtype=torch.int8)
    th = [-float("inf")] + list(thresholds) + [float("inf")]
    for l, low, high in zip(labels, th[:-1], th[1:]):
        match_labels[(matched_vals >= low) & (matched_vals < high)] = l
    if allow_low_quality:
        highest_per_gt, _ = q.max(dim=1)
        pred_pairs = torch.nonzero(q == highest_per_gt[:, None])
        match_labels[pred_pairs[:, 1]] = 1
    return matches.numpy(), match_labels.numpy()


@pytest.mark.parametrize(
    "thresholds,labels,allow",
    [([0.2, 0.6], [0, -1, 1], True), ([0.5], [0, 1], False)],
)
def test_matcher_oracle(thresholds, labels, allow):
    rng = np.random.RandomState(4)
    quality = rng.uniform(0.001, 1.0, (5, 40)).astype(np.float32)
    m = Matcher(thresholds, labels, allow_low_quality_matches=allow)
    got_idx, got_lab = m(jnp.asarray(quality))
    want_idx, want_lab = _d2_matcher_oracle(quality, thresholds, labels, allow)
    np.testing.assert_array_equal(np.asarray(got_lab), want_lab)
    # matched index only matters where a positive label was assigned
    pos = want_lab == 1
    np.testing.assert_array_equal(np.asarray(got_idx)[pos], want_idx[pos])


# ------------------------------------------------------------ Box2Box deltas
def test_box2box_deltas_oracle():
    rng = np.random.RandomState(5)
    src = _rand_boxes(rng, 30)
    tgt = _rand_boxes(rng, 30)
    w = (10.0, 10.0, 5.0, 5.0)

    got = np.asarray(get_deltas(jnp.asarray(src), jnp.asarray(tgt), weights=w))

    st = torch.tensor(src)
    tt = torch.tensor(tgt)
    sw, sh = st[:, 2] - st[:, 0], st[:, 3] - st[:, 1]
    scx, scy = st[:, 0] + 0.5 * sw, st[:, 1] + 0.5 * sh
    tw, th = tt[:, 2] - tt[:, 0], tt[:, 3] - tt[:, 1]
    tcx, tcy = tt[:, 0] + 0.5 * tw, tt[:, 1] + 0.5 * th
    want = torch.stack(
        [
            w[0] * (tcx - scx) / sw,
            w[1] * (tcy - scy) / sh,
            w[2] * torch.log(tw / sw),
            w[3] * torch.log(th / sh),
        ],
        dim=1,
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

    # apply_deltas round-trip + scale clamp semantics (d2: dw/dh clamped at
    # log(1000/16) BEFORE exp)
    deltas = rng.randn(30, 4).astype(np.float32) * 2.0
    got_boxes = np.asarray(apply_deltas(jnp.asarray(deltas), jnp.asarray(src), weights=w))
    dt = torch.tensor(deltas)
    clamp = math.log(1000.0 / 16)
    dx, dy = dt[:, 0] / w[0], dt[:, 1] / w[1]
    dw = torch.clamp(dt[:, 2] / w[2], max=clamp)
    dh = torch.clamp(dt[:, 3] / w[3], max=clamp)
    pcx, pcy = dx * sw + scx, dy * sh + scy
    pw, ph = torch.exp(dw) * sw, torch.exp(dh) * sh
    want_boxes = torch.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], dim=1
    ).numpy()
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=2e-4, atol=2e-3)

    # round trip: apply(get(src, tgt), src) == tgt
    rt = np.asarray(
        apply_deltas(get_deltas(jnp.asarray(src), jnp.asarray(tgt), weights=w),
                     jnp.asarray(src), weights=w)
    )
    np.testing.assert_allclose(rt, tgt, rtol=1e-4, atol=1e-2)


# -------------------------------------------------------------- pgt_top_k
def _pgt_top_k_oracle(boxes, scores, present, logits, top_k, thres):
    """roi_heads.py:1042-1215 transcription (single image, class-agn boxes)."""
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    keep = area > 20
    boxes, scores = boxes[keep], scores[keep]
    cls_int = np.nonzero(present)[0]
    out = []
    k = min(len(boxes), int(top_k)) if top_k >= 1 else max(int(len(boxes) * top_k), 1)
    sel = scores[:, cls_int]  # [P', C_present]
    t = torch.tensor(sel)
    top_s, top_i = torch.topk(t, k, dim=0)
    for rank in range(k):
        for j, ci in enumerate(cls_int):
            sc = float(top_s[rank, j])
            if thres > 0 and rank > 0 and sc < thres:
                continue
            out.append((int(ci), round(sc, 5),
                        tuple(np.round(boxes[int(top_i[rank, j])], 3)),
                        round(float(logits[ci]), 5)))
    return set(out)


@pytest.mark.parametrize("top_k,thres", [(1, 0.0), (3, 0.0), (4, 0.25)])
def test_pgt_top_k_oracle(top_k, thres):
    rng = np.random.RandomState(6)
    p, c = 64, 7
    boxes = _rand_boxes(rng, p)
    boxes[5] = [10, 10, 13, 13]  # area 9 <= 20: filtered
    scores = rng.permutation(p * c).reshape(p, c).astype(np.float32) / (p * c)
    present = np.zeros(c, bool)
    present[[1, 4, 6]] = True
    logits = rng.uniform(0.1, 1.0, c).astype(np.float32)

    got = pgt_top_k(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones((p,), bool),
        jnp.asarray(present), jnp.asarray(logits), top_k=top_k, thres=thres,
    )
    got_set = set()
    for i in np.nonzero(np.asarray(got.valid))[0]:
        got_set.add(
            (int(np.asarray(got.classes)[i]),
             round(float(np.asarray(got.scores)[i]), 5),
             tuple(np.round(np.asarray(got.boxes)[i], 3)),
             round(float(np.asarray(got.weights)[i]), 5))
        )
    want = _pgt_top_k_oracle(boxes, scores, present, logits, top_k, thres)
    assert got_set == want


# --------------------------------------------------- K-head inference average
def test_predict_K_averaging_oracle():
    rng = np.random.RandomState(7)
    b, p, c = 2, 10, 5
    scores_K = [rng.randn(b, p, c + 1).astype(np.float32) for _ in range(3)]
    deltas_K = [rng.randn(b, p, 4).astype(np.float32) * 0.1 for _ in range(3)]
    pboxes = np.stack([_rand_boxes(rng, p) for _ in range(b)])

    probs = np.asarray(predict_probs_K([jnp.asarray(s) for s in scores_K]))
    want = torch.stack([F.softmax(torch.tensor(s), dim=-1) for s in scores_K]).mean(0)
    np.testing.assert_allclose(probs, want.numpy(), rtol=2e-5, atol=1e-6)

    boxes = np.asarray(
        predict_boxes_K([jnp.asarray(d) for d in deltas_K], jnp.asarray(pboxes),
                        (10.0, 10.0, 5.0, 5.0))
    )
    mean_d = np.mean(deltas_K, axis=0)
    want_boxes = np.asarray(
        apply_deltas(jnp.asarray(mean_d), jnp.asarray(pboxes), weights=(10.0, 10.0, 5.0, 5.0))
    )
    np.testing.assert_allclose(boxes, want_boxes, rtol=1e-5, atol=1e-4)


# -------------------------------------------- refined-box mining feed (RPN)
@pytest.mark.parametrize("mixed", [False, True])
def test_rpn_pgt_uses_refined_boxes_oracle(mixed, monkeypatch):
    """The RPN pseudo-GT must be mined from the refinery's REGRESSED boxes
    (reference roi_heads.py:823-829,872-881: prev_pred_boxes =
    box_refinery[k].predict_boxes = apply_deltas(deltas_k, proposal_boxes),
    fast_rcnn_open_vocabulary.py:961-985), not the raw proposals — for both
    the plain and the mixed heads. The torch oracle re-derives the decode
    and the top-1 selection with nonzero deltas."""
    from wsovod_tpu.models.poolers import ROIPooler
    from wsovod_tpu.models.roi_heads import WSOVODROIHeads
    from wsovod_tpu.models.roi_heads_mixed import WSOVODMixedDatasetsROIHeads
    from wsovod_tpu.models.mining import get_image_level_gt
    from wsovod_tpu.structures.instances import Instances

    rng = np.random.RandomState(17)
    b, n, c_feat, C = 2, 16, 128, 4
    feats = {
        "res5": jnp.asarray(np.abs(rng.randn(b, 10, 12, c_feat)).astype(np.float32))
    }
    pb = np.stack([_rand_boxes(rng, n, span=30.0) for _ in range(b)])
    proposals = Instances(
        jnp.ones((b, n), bool),
        proposal_boxes=jnp.asarray(pb),
        objectness_logits=jnp.asarray(rng.rand(b, n).astype(np.float32)),
    )
    gt_classes = jnp.asarray(rng.randint(0, C, (b, 3)))
    gt_valid = jnp.ones((b, 3), bool)
    emb = jnp.asarray(rng.randn(C, 8).astype(np.float32))

    kw = dict(
        num_classes=C,
        pooler=ROIPooler(7, scales=[0.25], pooler_type="ROIPool"),
        dan_fc_dims=(16, 16), refine_k=1, refine_reg=(True,),
        ov_weight_dim=8, rpn_on=True, sampling_batch_size=(64,),
    )
    if mixed:
        heads = WSOVODMixedDatasetsROIHeads(
            dataset_names=("voc_synth",), num_classes_list=(C,), **kw
        )
        call_kw = dict(source_id=0)
    else:
        heads = WSOVODROIHeads(**kw)
        call_kw = {}

    key = jax.random.PRNGKey(3)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(9)}
    params = heads.init(
        rngs, feats, proposals, gt_classes, gt_valid, embeddings=emb, rng=key,
        **call_kw,
    )
    # force NONZERO regression deltas so refined boxes differ from proposals
    bp = params["params"]["box_refinery_0"]["bbox_pred"]
    bp["kernel"] = jnp.asarray(
        rng.randn(*np.asarray(bp["kernel"]).shape).astype(np.float32) * 0.02
    )
    bp["bias"] = jnp.asarray([0.5, -0.3, 0.2, 0.1], np.float32)

    out = heads.apply(
        params, feats, proposals, gt_classes, gt_valid, embeddings=emb,
        rng=key, rngs={"dropout": jax.random.PRNGKey(9)}, **call_kw,
    )
    assert out.proposal_targets is not None

    # re-extract the refinery's raw predictions with the same params/rngs
    # (flax dropout rngs are path-derived, so the replay is deterministic)
    def extract(m, feats, proposals):
        roi_feats, miner_feats = m._pooled_box_features(
            feats, proposals, None, train=True
        )
        miner = m.object_miners[m._miner_index[0]] if mixed else m.object_miner
        mil = miner(miner_feats, proposals.valid)
        s, d = m.box_refinery[0](
            roi_feats, classifier=None, append_background=True, embeddings=emb
        )
        return miner.predict_probs_img(mil), s, d

    img_logits, scores, deltas = heads.apply(
        params, feats, proposals, method=extract,
        rngs={"dropout": jax.random.PRNGKey(9)},
    )

    # torch oracle: decode = d2 apply_deltas with the (10,10,5,5) weights
    w = (10.0, 10.0, 5.0, 5.0)
    dt = torch.tensor(np.asarray(deltas, np.float32))
    st = torch.tensor(pb)
    sw, sh = st[..., 2] - st[..., 0], st[..., 3] - st[..., 1]
    scx, scy = st[..., 0] + 0.5 * sw, st[..., 1] + 0.5 * sh
    clamp = math.log(1000.0 / 16)
    dx, dy = dt[..., 0] / w[0], dt[..., 1] / w[1]
    dw = torch.clamp(dt[..., 2] / w[2], max=clamp)
    dh = torch.clamp(dt[..., 3] / w[3], max=clamp)
    pcx, pcy = dx * sw + scx, dy * sh + scy
    pw, ph = torch.exp(dw) * sw, torch.exp(dh) * sh
    decoded = torch.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], -1
    ).numpy()
    # deltas really are nonzero: decoded boxes differ from the proposals
    assert np.abs(decoded - pb).max() > 0.5

    # expected pgt: top-1 per present class over softmax scores on the
    # DECODED boxes (pgt_top_k itself is oracle-tested above)
    prev = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    _, _, present = jax.vmap(lambda c, v: get_image_level_gt(c, v, C))(
        gt_classes, gt_valid
    )
    want = jax.vmap(
        lambda bx, s, v, p, wl: pgt_top_k(bx, s[:, :C], v, p, wl, top_k=1)
    )(
        jnp.asarray(decoded), prev, proposals.valid, present,
        jax.lax.stop_gradient(img_logits),
    )
    got = out.proposal_targets
    gv = np.asarray(got.valid)
    np.testing.assert_array_equal(gv, np.asarray(want.valid))
    np.testing.assert_allclose(
        np.asarray(got.boxes)[gv], np.asarray(want.boxes)[np.asarray(want.valid)],
        rtol=1e-5, atol=1e-4,
    )
    # and they must NOT be raw proposal rows
    for bi in range(b):
        for g in np.nonzero(gv[bi])[0]:
            box = np.asarray(got.boxes)[bi, g]
            assert np.abs(pb[bi] - box).max(axis=-1).min() > 1e-3


# ---------------------------------------- sampling_on=False plain labeling
def test_label_and_sample_plain_oracle():
    """SAMPLING_ON=False fallback == the plain d2 label_and_sample_proposals
    (reference roi_heads.py:287-408 via :810-815): ROI_HEADS matcher, NO
    subsampling (_sample_proposals :245-277 early-returns every row),
    matched rows get the pgt class/box/score/weight, unmatched background,
    matcher-ignore -1."""
    from wsovod_tpu.models.mining import PseudoGT, label_and_sample_plain

    rng = np.random.RandomState(11)
    P, G, C = 40, 6, 5
    pb = _rand_boxes(rng, P, span=120.0)
    gb = _rand_boxes(rng, G, span=120.0)
    # make some proposals EXACT copies of gt so matches exist
    pb[3], pb[17], pb[29] = gb[0], gb[2], gb[4]
    g_valid = np.array([1, 1, 1, 1, 0, 0], bool)
    g_cls = rng.randint(0, C, G).astype(np.int32)
    g_sc = rng.uniform(0.2, 1.0, G).astype(np.float32)
    g_w = rng.uniform(0.1, 1.0, G).astype(np.float32)
    p_valid = np.ones(P, bool)
    p_valid[-3:] = False

    matcher = Matcher([0.3, 0.6], [0, -1, 1], allow_low_quality_matches=False)
    pgt = PseudoGT(
        jnp.asarray(gb), jnp.asarray(g_cls), jnp.asarray(g_sc),
        jnp.asarray(g_w), jnp.asarray(g_valid),
    )
    got = label_and_sample_plain(
        jnp.asarray(pb), jnp.asarray(p_valid), pgt, matcher, C
    )

    # torch oracle: d2 Matcher + plain labeling
    pt, gt_ = torch.tensor(pb), torch.tensor(gb[g_valid])
    area_p = (pt[:, 2] - pt[:, 0]).clamp(min=0) * (pt[:, 3] - pt[:, 1]).clamp(min=0)
    area_g = (gt_[:, 2] - gt_[:, 0]).clamp(min=0) * (gt_[:, 3] - gt_[:, 1]).clamp(min=0)
    lt = torch.max(gt_[:, None, :2], pt[None, :, :2])
    rb = torch.min(gt_[:, None, 2:], pt[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    iou = inter / (area_g[:, None] + area_p[None, :] - inter)
    best, idx = iou.max(dim=0)
    label = torch.full((P,), 0, dtype=torch.int64)
    label[(best >= 0.3) & (best < 0.6)] = -1
    label[best >= 0.6] = 1
    vi = np.nonzero(g_valid)[0]
    want_cls = np.where(
        label.numpy() == 1, g_cls[vi][idx.numpy()], np.int32(C)
    )
    want_cls = np.where(label.numpy() == -1, -1, want_cls)
    want_cls = np.where(p_valid, want_cls, -1)

    np.testing.assert_array_equal(np.asarray(got.gt_classes), want_cls)
    m = label.numpy() == 1
    np.testing.assert_allclose(
        np.asarray(got.gt_boxes)[m], gb[vi][idx.numpy()][m], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.gt_scores)[m], g_sc[vi][idx.numpy()][m], rtol=1e-6
    )
    keep = want_cls != -1
    np.testing.assert_allclose(
        np.asarray(got.gt_weights)[keep], g_w[vi][idx.numpy()][keep], rtol=1e-6
    )
    assert (np.asarray(got.gt_weights)[~keep] == 0).all()
    # NO subsampling: every valid matched row keeps its class label
    assert (np.asarray(got.gt_classes)[m & p_valid] == want_cls[m & p_valid]).all()
