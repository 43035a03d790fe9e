from .amg import SamAutomaticMaskGenerator, build_point_grid, generate_crop_boxes
from .modeling import SAM, SAM_CONFIGS, MaskDecoder, PromptEncoder, SAMImageEncoder
from .predictor import SamPredictorBuffer, mask_to_box, preprocess_image_for_sam
from .weights import import_sam_weights, load_sam_checkpoint

__all__ = [
    "SAM",
    "SAM_CONFIGS",
    "SAMImageEncoder",
    "PromptEncoder",
    "MaskDecoder",
    "SamPredictorBuffer",
    "SamAutomaticMaskGenerator",
    "build_point_grid",
    "generate_crop_boxes",
    "mask_to_box",
    "preprocess_image_for_sam",
    "import_sam_weights",
    "load_sam_checkpoint",
]
