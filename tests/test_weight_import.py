"""Structural tests of the reference-checkpoint importer: build a fake
torch-layout state dict matching the reference module names and verify every
mapped tensor lands in the flax template with the right shape/permutation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsovod_tpu.config import get_cfg
from wsovod_tpu.models import build_model
from wsovod_tpu.utils.weight_import import import_wsovod_model, import_wsr_resnet


def _tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlignV2"
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_DIM = 8
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.DATA_AWARE = True
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 8
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_NUM = 1
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_REG = [True]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.LOAD_PROPOSALS = True
    return cfg


def _template(cfg):
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    b = rng.uniform(0, 40, (1, 4, 2))
    batch = {
        "images": jnp.zeros((1, 64, 64, 3)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "sam_boxes": jnp.asarray(np.concatenate([b, b + 15], -1).astype(np.float32)),
        "sam_scores": jnp.asarray(rng.rand(1, 4).astype(np.float32)),
        "sam_valid": jnp.ones((1, 4), bool),
        "gt_classes": jnp.asarray([[0, 1]]),
        "gt_valid": jnp.ones((1, 2), bool),
    }
    emb = jnp.zeros((3, 8))
    return model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True, iteration=jnp.asarray(0, jnp.int32),
        rng=jax.random.PRNGKey(2), embeddings=emb,
    )


def _fake_reference_blobs(template):
    """Torch-layout blobs for every key the importer understands, sized from
    the flax template (inverse permutations)."""
    rng = np.random.RandomState(0)
    p = template["params"]
    blobs = {}

    # backbone (d2 ResNet names)
    def add_conv(torch_name, flax_kernel, with_bn=True):
        h, w, cin, cout = flax_kernel.shape
        blobs[torch_name + ".weight"] = rng.randn(cout, cin, h, w).astype(np.float32)
        if with_bn:
            for stat in ("weight", "bias", "running_mean", "running_var"):
                blobs[f"{torch_name}.norm.{stat}"] = rng.rand(cout).astype(np.float32)

    bb = p["backbone"]
    for i in (1, 2, 3):
        add_conv(f"backbone.stem.conv{i}", np.asarray(bb["stem"][f"conv{i}"]["kernel"]))
    for stage in range(2, 6):
        for blk in range(2):  # R18: 2 blocks/stage
            ours = bb[f"res{stage}_{blk}"]
            for ci in (1, 2):
                add_conv(
                    f"backbone.res{stage}.{blk}.conv{ci}",
                    np.asarray(ours[f"conv{ci}"]["kernel"]),
                )
            if "shortcut" in ours:
                add_conv(
                    f"backbone.res{stage}.{blk}.shortcut",
                    np.asarray(ours["shortcut"]["kernel"]),
                )

    # DAN: fc1 torch weight is [out, c*h*w] (CHW flat)
    dan = p["roi_heads"]["box_head"]
    hh, ww, cc, out1 = np.asarray(dan["fc1"]["kernel"]).shape
    blobs["roi_heads.box_head.fc1.weight"] = rng.randn(out1, cc * hh * ww).astype(np.float32)
    blobs["roi_heads.box_head.fc1.bias"] = rng.randn(out1).astype(np.float32)
    in2, out2 = np.asarray(dan["fc2"]["kernel"]).shape
    blobs["roi_heads.box_head.fc2.weight"] = rng.randn(out2, in2).astype(np.float32)
    blobs["roi_heads.box_head.fc2.bias"] = rng.randn(out2).astype(np.float32)

    # miner
    miner = p["roi_heads"]["object_miner"]
    for nm in ("cls", "det"):
        i_, o_ = np.asarray(miner[nm]["kernel"]).shape
        blobs[f"roi_heads.object_miner.{nm}.weight"] = rng.randn(o_, i_).astype(np.float32)
        blobs[f"roi_heads.object_miner.{nm}.bias"] = rng.randn(o_).astype(np.float32)

    # refinery 0 OV projections + bbox_pred
    ref = p["roi_heads"]["box_refinery_0"]
    for tname, ours_k in (("projection.0", "proj1"), ("projection.2", "proj2")):
        i_, o_ = np.asarray(ref["cls"][ours_k]["kernel"]).shape
        blobs[f"roi_heads.box_refinery.0.cls.{tname}.weight"] = rng.randn(o_, i_).astype(np.float32)
        blobs[f"roi_heads.box_refinery.0.cls.{tname}.bias"] = rng.randn(o_).astype(np.float32)
    i_, o_ = np.asarray(ref["bbox_pred"]["kernel"]).shape
    blobs["roi_heads.box_refinery.0.bbox_pred.weight"] = rng.randn(o_, i_).astype(np.float32)
    blobs["roi_heads.box_refinery.0.bbox_pred.bias"] = rng.randn(o_).astype(np.float32)

    # data-aware head
    dah = p["data_aware_head"]
    for nm in ("linear1", "linear2"):
        i_, o_ = np.asarray(dah[nm]["kernel"]).shape
        blobs[f"data_aware_head.{nm}.weight"] = rng.randn(o_, i_).astype(np.float32)
        blobs[f"data_aware_head.{nm}.bias"] = rng.randn(o_).astype(np.float32)
    blobs["data_aware_head.datasets_feat.weight"] = rng.randn(
        *np.asarray(dah["datasets_feat"]).shape
    ).astype(np.float32)

    # RPN head
    rpn = p["proposal_generator"]["rpn_head"]
    for nm in ("conv", "objectness_logits", "anchor_deltas"):
        kh, kw, cin, cout = np.asarray(rpn[nm]["kernel"]).shape
        blobs[f"proposal_generator.rpn_head.{nm}.weight"] = rng.randn(
            cout, cin, kh, kw
        ).astype(np.float32)
        blobs[f"proposal_generator.rpn_head.{nm}.bias"] = rng.randn(cout).astype(np.float32)
    return blobs


def test_full_model_import_shapes_and_permutations():
    cfg = _tiny_cfg()
    template = _template(cfg)
    blobs = _fake_reference_blobs(template)
    out = import_wsovod_model(blobs, template, depth=18, pooled_shape=(512, 7, 7))

    ref_shapes = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, template)
    new_shapes = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, out)
    assert ref_shapes == new_shapes, "import must preserve the template structure"

    p = out["params"]
    # conv permutation: torch OIHW -> HWIO
    t = blobs["backbone.stem.conv1.weight"]
    np.testing.assert_allclose(
        np.asarray(p["backbone"]["stem"]["conv1"]["kernel"]),
        np.transpose(t, (2, 3, 1, 0)),
    )
    # fc2 transpose
    np.testing.assert_allclose(
        np.asarray(p["roi_heads"]["box_head"]["fc2"]["kernel"]),
        blobs["roi_heads.box_head.fc2.weight"].T,
    )
    # fc1 CHW -> HWC 4D kernel
    k = np.asarray(p["roi_heads"]["box_head"]["fc1"]["kernel"])
    o = k.shape[-1]
    t = blobs["roi_heads.box_head.fc1.weight"].reshape(o, 512, 7, 7)
    np.testing.assert_allclose(k, t.transpose(2, 3, 1, 0))
    # BN stats land in FrozenBatchNorm fields
    bn = p["backbone"]["stem"]["conv1"]["FrozenBatchNorm_0"]
    np.testing.assert_allclose(
        np.asarray(bn["mean"]), blobs["backbone.stem.conv1.norm.running_mean"]
    )


def test_wsr_resnet_importer_covers_all_backbone_params():
    cfg = _tiny_cfg()
    template = _template(cfg)
    blobs = _fake_reference_blobs(template)
    imported = import_wsr_resnet(blobs, depth=18, prefix="backbone.")
    tpl_bb = template["params"]["backbone"]
    tpl_leaves = {
        jax.tree_util.keystr(kp)
        for kp, _ in jax.tree_util.tree_leaves_with_path(tpl_bb)
    }
    imp_leaves = {
        jax.tree_util.keystr(kp)
        for kp, _ in jax.tree_util.tree_leaves_with_path(imported)
    }
    assert tpl_leaves == imp_leaves


def test_torch_oracle_functional_equivalence():
    """Numerical guard on the importer's permutations (VERDICT r1 #10):
    a torch conv+FrozenBN and a torch DAN fc1 (Linear over flattened NCHW)
    must produce the same outputs as our flax layers fed the imported
    weights, on the same random input."""
    torch = pytest.importorskip("torch")

    from wsovod_tpu.models.layers import ConvNorm
    from wsovod_tpu.utils.weight_import import _conv, _convnorm

    rng = np.random.RandomState(0)

    # ---- conv3x3 + FrozenBN (the backbone building block) ----
    cin, cout = 8, 16
    tconv = torch.nn.Conv2d(cin, cout, 3, padding=1, bias=False)
    bn_w = torch.rand(cout) + 0.5
    bn_b = torch.randn(cout)
    bn_m = torch.randn(cout)
    bn_v = torch.rand(cout) + 0.5
    x = rng.randn(2, cin, 10, 12).astype(np.float32)
    with torch.no_grad():
        y = tconv(torch.from_numpy(x))
        y = (y - bn_m[None, :, None, None]) / torch.sqrt(
            bn_v[None, :, None, None] + 1e-5
        ) * bn_w[None, :, None, None] + bn_b[None, :, None, None]
    want = y.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    blobs = {
        "c.weight": tconv.weight.detach().numpy(),
        "c.norm.weight": bn_w.numpy(),
        "c.norm.bias": bn_b.numpy(),
        "c.norm.running_mean": bn_m.numpy(),
        "c.norm.running_var": bn_v.numpy(),
    }
    imported = _convnorm(blobs, "c")
    layer = ConvNorm(cout, 3, norm="FrozenBN", use_bias=False)
    template = layer.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    flat = {"kernel": imported["kernel"], **{
        f"FrozenBatchNorm_0": imported["FrozenBatchNorm_0"]
    }}
    got = layer.apply(
        {"params": flat}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    # ---- DAN fc1: torch Linear over CHW-flat pooled features ----
    import flax.linen as nn

    c, p = 12, 7
    out_dim = 24
    tfc = torch.nn.Linear(c * p * p, out_dim)
    pooled = rng.randn(5, c, p, p).astype(np.float32)  # NCHW (torch layout)
    with torch.no_grad():
        want_fc = tfc(torch.from_numpy(pooled.reshape(5, -1))).numpy()

    w1 = tfc.weight.detach().numpy()  # [out, c*p*p]
    kernel = w1.reshape(out_dim, c, p, p).transpose(2, 3, 1, 0)  # (h, w, c, out)
    dg = nn.DenseGeneral(out_dim, axis=(-3, -2, -1))
    got_fc = dg.apply(
        {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(tfc.bias.detach().numpy())}},
        jnp.asarray(pooled.transpose(0, 2, 3, 1)),  # NHWC
    )
    np.testing.assert_allclose(np.asarray(got_fc), want_fc, rtol=1e-4, atol=1e-4)
