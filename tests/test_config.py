import os

import pytest

from wsovod_tpu.config import get_cfg

REF_CONFIGS = "/root/reference/configs"


def test_defaults_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.DEVICE = "cpu"
    cfg.defrost()
    cfg.MODEL.DEVICE = "cpu"
    assert cfg.MODEL.DEVICE == "cpu"


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.02", "MODEL.RPN.NMS_THRESH", "0.5"])
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.MODEL.RPN.NMS_THRESH == 0.5


def test_clone_independent():
    cfg = get_cfg()
    c2 = cfg.clone()
    c2.SOLVER.BASE_LR = 123.0
    assert cfg.SOLVER.BASE_LR != 123.0


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference not mounted")
@pytest.mark.parametrize(
    "rel",
    [
        "COCO-Detection/WSOVOD_WSR_18_DC5_1x.yaml",
        "COCO-Detection/WSOVOD_MRRP_WSR_50_DC5_1x.yaml",
        "PascalVOC-Detection/WSOVOD_V_16_DC5_1x.yaml",
        "MixedDatasets-Detection/WSOVOD_WSR_18_DC5_1x_voc07+coco.yaml",
        "ImageNet-Detection/WSOVOD_WSR_18_DC5_1x.yaml",
    ],
)
def test_reference_yaml_configs_load(rel):
    """Every reference YAML (with _BASE_ inheritance) must merge cleanly."""
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REF_CONFIGS, rel))
    cfg.freeze()
    assert cfg.MODEL.META_ARCHITECTURE.startswith("GeneralizedRCNN_WSOVOD")
    assert cfg.MODEL.LOAD_PROPOSALS is True


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference not mounted")
def test_base_yaml_values():
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(REF_CONFIGS, "COCO-Detection/WSOVOD_WSR_18_DC5_1x.yaml")
    )
    assert cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN == 1024
    assert cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST == 0.3
    assert cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.NORM_TEMP == 50.0
    assert cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_NUM == 1
    assert cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_REG == [True]
    assert tuple(cfg.SOLVER.STEPS) == (140000,)
    assert cfg.MODEL.RESNETS.DEPTH == 18


def test_our_configs_load():
    import glob

    cfgs = glob.glob("configs/**/*.yaml", recursive=True)
    assert len(cfgs) >= 15
    for path in cfgs:
        cfg = get_cfg()
        cfg.merge_from_file(path)
        cfg.freeze()
