from .resnet_wsl import WSRResNet, build_wsl_resnet_backbone
from .vgg import VGG16, build_vgg_backbone


def build_backbone(cfg):
    """Explicit, registry-free backbone builder (replaces d2 BACKBONE_REGISTRY)."""
    name = cfg.MODEL.BACKBONE.NAME
    builders = {
        "build_wsl_resnet_backbone": build_wsl_resnet_backbone,
        "build_mrrp_wsl_resnet_backbone": build_wsl_resnet_backbone,
        "build_vgg_backbone": build_vgg_backbone,
        "build_mrrp_vgg_backbone": build_vgg_backbone,
    }
    if name == "build_swin_backbone":
        from .swin import build_swin_backbone

        return build_swin_backbone(cfg)
    if name == "build_swin_fpn_backbone":
        from .swin import build_swin_fpn_backbone

        return build_swin_fpn_backbone(cfg)
    if name not in builders:
        raise ValueError(f"Unknown backbone: {name}")
    return builders[name](cfg)


__all__ = [
    "WSRResNet",
    "VGG16",
    "build_wsl_resnet_backbone",
    "build_vgg_backbone",
    "build_backbone",
]
