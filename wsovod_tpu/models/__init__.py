from .meta_arch import GeneralizedRCNN_WSOVOD, build_model, postprocess_detections

__all__ = ["GeneralizedRCNN_WSOVOD", "build_model", "postprocess_detections"]
