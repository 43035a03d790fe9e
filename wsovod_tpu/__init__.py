"""WSOVOD-TPU: a TPU-native (JAX/XLA/Pallas/pjit) weakly supervised
open-vocabulary object detection framework.

Re-implements the capabilities of HunterJ-Lin/WSOVOD (AAAI 2024,
arXiv 2312.12437) with a TPU-first architecture: static padded shapes with
validity masks instead of ragged per-image lists, functional train steps under
`pjit` over a device mesh, Pallas kernels for the ROI pooling hot path, and a
cosine-similarity GEMM against cached CLIP text embeddings for region
classification.
"""

__version__ = "0.1.0"
