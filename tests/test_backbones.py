import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsovod_tpu.config import get_cfg
from wsovod_tpu.models.backbones import build_backbone
from wsovod_tpu.models.backbones.resnet_wsl import WSRResNet
from wsovod_tpu.models.backbones.vgg import VGG16


def test_wsr_resnet18_dc5_shapes():
    m = WSRResNet(depth=18, res5_dilation=2, out_features=("res5",))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    # stride 8, 512 channels for R18
    assert out["res5"].shape == (1, 8, 8, 512)
    assert m.output_strides() == {"res5": 8}
    assert m.output_channels() == {"res5": 512}


def test_wsr_resnet50_dc5_shapes():
    m = WSRResNet(depth=50, res2_out_channels=256, res5_dilation=2, out_features=("res5",))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["res5"].shape == (1, 8, 8, 2048)


def test_wsr_resnet18_no_dilation_stride16():
    m = WSRResNet(depth=18, res5_dilation=1, out_features=("res5",))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["res5"].shape == (1, 4, 4, 512)
    assert m.output_strides() == {"res5": 16}


def test_mrrp_resnet_branch_concat():
    m = WSRResNet(
        depth=18, res5_dilation=2, out_features=("res5",),
        mrrp_on=True, mrrp_num_branch=3, mrrp_dilations=(1, 2, 4), mrrp_stage="res5",
    )
    x = jnp.zeros((2, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x, train=True)
    out = m.apply(params, x, train=True)
    # branches concatenated along batch: 2 images * 3 branches
    assert out["res5"].shape == (6, 8, 8, 512)
    # test mode: single test branch
    out_t = m.apply(params, x, train=False)
    assert out_t["res5"].shape == (2, 8, 8, 512)


def test_mrrp_branches_share_weights():
    m = WSRResNet(
        depth=18, res5_dilation=2, out_features=("res5",),
        mrrp_on=True, mrrp_num_branch=2, mrrp_dilations=(1, 1), mrrp_stage="res5",
    )
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, train=True)
    out = m.apply(params, x, train=True)["res5"]
    # identical dilations + shared weights => identical branch outputs
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), rtol=1e-5, atol=1e-5)


def test_vgg16_dc5_shapes():
    m = VGG16(conv5_dilation=2, out_features=("plain5",))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    # stride 8 and the reference's one-pixel shrink from the unpadded stride-1 pool
    assert out["plain5"].shape == (1, 7, 7, 512)
    assert m.output_strides() == {"plain5": 8}


def test_build_from_reference_config():
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/COCO-Detection/WSOVOD_WSR_18_DC5_1x.yaml"
    )
    m = build_backbone(cfg)
    assert isinstance(m, WSRResNet)
    assert m.depth == 18
    assert m.res5_dilation == 2


def test_param_count_resnet18():
    m = WSRResNet(depth=18, res5_dilation=2, out_features=("res5",))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    # R18 backbone ~11M conv params + stem/BN stats; sanity band
    assert 10e6 < n < 14e6
