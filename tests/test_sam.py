import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def _tiny_sam():
    from wsovod_tpu.offline.sam.modeling import SAM, SAM_CONFIGS

    SAM_CONFIGS["tiny"] = dict(embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,))
    return SAM(model_type="tiny", img_size=64)


def test_sam_end_to_end_shapes():
    sam = _tiny_sam()
    x = jnp.zeros((1, 64, 64, 3))
    boxes = jnp.asarray(np.array([[4, 4, 40, 40], [10, 10, 30, 50]], np.float32))
    params = sam.init(KEY, x, boxes)
    masks, iou = sam.apply(params, x, boxes)
    # 64/16 = 4 -> masks upscaled 4x to 16
    assert masks.shape == (2, 4, 16, 16)
    assert iou.shape == (2, 4)


def test_sam_point_decode():
    sam = _tiny_sam()
    x = jnp.zeros((1, 64, 64, 3))
    boxes = jnp.asarray(np.array([[4, 4, 40, 40]], np.float32))
    params = sam.init(KEY, x, boxes)
    emb = sam.apply(params, x, method=sam.encode_image)
    pts = jnp.asarray(np.array([[[32.0, 32.0]]], np.float32))
    labels = jnp.ones((1, 1), jnp.int32)
    masks, iou = sam.apply(params, emb, pts, labels, method=sam.decode_points)
    assert masks.shape == (1, 4, 16, 16)


def test_mask_to_box():
    from wsovod_tpu.offline.sam.predictor import mask_to_box

    m = jnp.zeros((8, 8), bool).at[2:5, 3:7].set(True)
    fb = jnp.asarray([0.0, 0, 8, 8])
    box = np.asarray(mask_to_box(m, fb))
    np.testing.assert_allclose(box, [3, 2, 7, 5])
    empty = jnp.zeros((8, 8), bool)
    np.testing.assert_allclose(np.asarray(mask_to_box(empty, fb)), [0, 0, 8, 8])


def test_point_grid_and_crops():
    from wsovod_tpu.offline.sam.amg import build_point_grid, generate_crop_boxes

    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert (g > 0).all() and (g < 1).all()
    crops = generate_crop_boxes(100, 150, 1, 0.34)
    assert crops[0] == (0, 0, 150, 100)
    assert len(crops) == 5  # full + 2x2


def test_flax_convtranspose_matches_torch():
    """The mask decoder's upscaling ConvTranspose must match torch semantics
    under the importer's kernel transpose."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    rng = np.random.RandomState(0)
    x = rng.randn(1, 5, 5, 3).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(3, 4, kernel_size=2, stride=2)
    ref = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    ref = ref.transpose(0, 2, 3, 1)

    w = tconv.weight.detach().numpy()  # [in, out, kh, kw]
    b = tconv.bias.detach().numpy()
    mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2), transpose_kernel=True)
    params = {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                         "bias": jnp.asarray(b)}}
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_prompt_encoder_box_embedding():
    from wsovod_tpu.offline.sam.modeling import PromptEncoder

    pe = PromptEncoder(embed_dim=32, image_embedding_size=(4, 4), input_image_size=(64, 64))
    boxes = jnp.asarray(np.array([[4, 4, 40, 40]], np.float32))
    params = pe.init(KEY, boxes=boxes)
    sparse, dense = pe.apply(params, boxes=boxes)
    assert sparse.shape == (1, 2, 32)
    assert dense.shape == (1, 4, 4, 32)
    pe_grid = pe.apply(params, method=pe.dense_pe)
    assert pe_grid.shape == (4, 4, 32)


def test_sam_refiner_refines_and_falls_back():
    from wsovod_tpu.models.sam_refine import SAMRefiner, sam_input_from_batch

    ref = SAMRefiner(sam_img_size=64)
    emb = jax.random.normal(KEY, (4, 4, 256))  # 64/16 = 4 grid
    boxes = jnp.asarray(np.array([[8, 8, 40, 40], [0, 0, 4, 4]], np.float32))
    valid = jnp.asarray([True, False])
    scale = jnp.asarray(1.0)
    params = ref.init(KEY, emb, boxes, valid, scale)
    out = ref.apply(params, emb, boxes, valid, scale)
    assert out.shape == (2, 4)
    # invalid rows fall back to the input box
    np.testing.assert_allclose(np.asarray(out[1]), [0, 0, 4, 4], atol=1e-5)
    assert np.isfinite(np.asarray(out)).all()

    imgs = jnp.zeros((2, 48, 64, 3))
    x, s = sam_input_from_batch(imgs, sam_img_size=64)
    assert x.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(s), [1.0, 1.0])


def test_roi_heads_with_bbox_refine_smoke():
    """Train forward with SAM refinement enabled and embeddings supplied."""
    from wsovod_tpu.models.poolers import ROIPooler
    from wsovod_tpu.models.roi_heads import WSOVODROIHeads

    pooler = ROIPooler(output_size=7, scales=[1.0 / 8], pooler_type="ROIAlignV2")
    heads = WSOVODROIHeads(
        num_classes=3, pooler=pooler, dan_fc_dims=(16, 16), refine_k=1,
        refine_reg=(True,), ov_weight_dim=8, rpn_on=True,
        bbox_refine=True, sam_img_size=64,
    )
    rng = np.random.RandomState(0)
    feats = {"res5": jax.random.normal(KEY, (1, 8, 8, 16))}
    from wsovod_tpu.structures.instances import Instances

    b = rng.uniform(0, 40, (1, 6, 2))
    proposals = Instances(
        jnp.ones((1, 6), bool),
        proposal_boxes=jnp.asarray(np.concatenate([b, b + 15], -1).astype(np.float32)),
        objectness_logits=jnp.asarray(rng.rand(1, 6).astype(np.float32)),
        level_ids=jnp.zeros((1, 6), jnp.int32),
    )
    emb = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    sam_embed = jax.random.normal(KEY, (1, 4, 4, 256))
    sam_scale = jnp.ones((1,))
    gt_classes = jnp.asarray([[0, 1]])
    gt_valid = jnp.ones((1, 2), bool)
    params = heads.init(
        {"params": KEY, "dropout": jax.random.PRNGKey(1)},
        feats, proposals, gt_classes, gt_valid,
        embeddings=emb, rng=jax.random.PRNGKey(2),
        sam_embed=sam_embed, sam_scale=sam_scale,
    )
    assert "sam_refiner" in params["params"]
    out = heads.apply(
        params, feats, proposals, gt_classes, gt_valid,
        embeddings=emb, rng=jax.random.PRNGKey(3),
        sam_embed=sam_embed, sam_scale=sam_scale,
        rngs={"dropout": jax.random.PRNGKey(4)},
    )
    for v in out.losses.values():
        assert np.isfinite(float(v))
    assert out.proposal_targets is not None


def test_vit_attention_chunked_matches_direct():
    """Blockwise global attention (q row-blocks) == direct attention with the
    decomposed rel-pos bias (SAM global layers at 64x64 tokens)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from wsovod_tpu.offline.sam.modeling import ViTAttention

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 32).astype(np.float32))
    att_c = ViTAttention(32, 2, input_size=(64, 64), q_chunk_rows=8)
    att_d = ViTAttention(32, 2, input_size=(64, 64), q_chunk_rows=0)
    p = att_c.init(jax.random.PRNGKey(0), x)
    p = jax.tree_util.tree_map(
        lambda a: a + 0.01 * np.random.RandomState(1).randn(*a.shape).astype(a.dtype), p
    )
    o_c = att_c.apply(p, x)
    o_d = att_d.apply(p, x)
    assert float(jnp.max(jnp.abs(o_c - o_d))) < 1e-4


def test_roi_heads_bbox_refine_prompt_cap():
    """sam_refine_max_boxes < padded G: valid-first rows are decoded and
    scattered back; uncapped rows keep their original boxes."""
    from wsovod_tpu.models.poolers import ROIPooler
    from wsovod_tpu.models.roi_heads import WSOVODROIHeads

    pooler = ROIPooler(output_size=7, scales=[1.0 / 8], pooler_type="ROIAlignV2")
    heads = WSOVODROIHeads(
        num_classes=3, pooler=pooler, dan_fc_dims=(16, 16), refine_k=1,
        refine_reg=(True,), ov_weight_dim=8, rpn_on=True,
        bbox_refine=True, sam_img_size=64, sam_refine_max_boxes=2,
    )
    rng = np.random.RandomState(0)
    feats = {"res5": jax.random.normal(KEY, (1, 8, 8, 16))}
    from wsovod_tpu.structures.instances import Instances

    b = rng.uniform(0, 40, (1, 6, 2))
    proposals = Instances(
        jnp.ones((1, 6), bool),
        proposal_boxes=jnp.asarray(np.concatenate([b, b + 15], -1).astype(np.float32)),
        objectness_logits=jnp.asarray(rng.rand(1, 6).astype(np.float32)),
        level_ids=jnp.zeros((1, 6), jnp.int32),
    )
    emb = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    sam_embed = jax.random.normal(KEY, (1, 4, 4, 256))
    sam_scale = jnp.ones((1,))
    gt_classes = jnp.asarray([[0, 1]])
    gt_valid = jnp.ones((1, 2), bool)
    params = heads.init(
        {"params": KEY, "dropout": jax.random.PRNGKey(1)},
        feats, proposals, gt_classes, gt_valid,
        embeddings=emb, rng=jax.random.PRNGKey(2),
        sam_embed=sam_embed, sam_scale=sam_scale,
    )
    out = heads.apply(
        params, feats, proposals, gt_classes, gt_valid,
        embeddings=emb, rng=jax.random.PRNGKey(3),
        sam_embed=sam_embed, sam_scale=sam_scale,
        rngs={"dropout": jax.random.PRNGKey(4)},
    )
    for v in out.losses.values():
        assert np.isfinite(float(v))


def test_mixed_roi_heads_with_bbox_refine():
    """Mixed-dataset train path runs SAM BBOX_REFINE (reference
    roi_heads.py:2261,2272,2344): with grafted SAM params the RPN pseudo-GT
    boxes must DIFFER from the unrefined run, and losses stay finite."""
    from wsovod_tpu.models.poolers import ROIPooler
    from wsovod_tpu.models.roi_heads_mixed import WSOVODMixedDatasetsROIHeads
    from wsovod_tpu.structures.instances import Instances

    pooler = ROIPooler(output_size=7, scales=[1.0 / 8], pooler_type="ROIAlignV2")
    heads = WSOVODMixedDatasetsROIHeads(
        num_classes=3, pooler=pooler, dan_fc_dims=(16, 16), refine_k=1,
        refine_reg=(True,), ov_weight_dim=8, rpn_on=True,
        bbox_refine=True, sam_img_size=64,
        dataset_names=("voc_a", "coco_b"), num_classes_list=(3, 5),
    )
    rng = np.random.RandomState(0)
    feats = {"res5": jax.random.normal(KEY, (1, 8, 8, 16))}
    b = rng.uniform(0, 40, (1, 6, 2))
    proposals = Instances(
        jnp.ones((1, 6), bool),
        proposal_boxes=jnp.asarray(np.concatenate([b, b + 15], -1).astype(np.float32)),
        objectness_logits=jnp.asarray(rng.rand(1, 6).astype(np.float32)),
        level_ids=jnp.zeros((1, 6), jnp.int32),
    )
    emb = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    sam_embed = jax.random.normal(KEY, (1, 4, 4, 256))
    sam_scale = jnp.ones((1,))
    gt_classes = jnp.asarray([[0, 1]])
    gt_valid = jnp.ones((1, 2), bool)
    params = heads.init(
        {"params": KEY, "dropout": jax.random.PRNGKey(1)},
        feats, proposals, gt_classes, gt_valid, source_id=0,
        embeddings=emb, rng=jax.random.PRNGKey(2),
        sam_embed=sam_embed, sam_scale=sam_scale,
    )
    assert "sam_refiner" in params["params"]
    out_sam = heads.apply(
        params, feats, proposals, gt_classes, gt_valid, source_id=0,
        embeddings=emb, rng=jax.random.PRNGKey(3),
        sam_embed=sam_embed, sam_scale=sam_scale,
        rngs={"dropout": jax.random.PRNGKey(4)},
    )
    out_plain = heads.apply(
        params, feats, proposals, gt_classes, gt_valid, source_id=0,
        embeddings=emb, rng=jax.random.PRNGKey(3),
        rngs={"dropout": jax.random.PRNGKey(4)},
    )
    for v in out_sam.losses.values():
        assert np.isfinite(float(v))
    gt = out_sam.proposal_targets
    gp = out_plain.proposal_targets
    assert gt is not None and gp is not None
    vs = np.asarray(gt.valid) & np.asarray(gp.valid)
    assert vs.any()
    diff = np.abs(np.asarray(gt.boxes)[vs] - np.asarray(gp.boxes)[vs]).max()
    assert diff > 1e-3, "SAM refinement did not change the mixed RPN pseudo-GT"
