"""API-parity surface for the reference's vendored d2 trainer module
(``wsovod/engine/defaults.py``): re-exports under the names reference users
know. The functionality lives in ``trainer``/``train_loop``/``evaluator``."""

from ..solver.build import auto_scale_workers, build_optimizer  # noqa: F401
from .evaluator import build_evaluator, inference_on_dataset, test_WSL  # noqa: F401
from .hooks import ParametersNormInspectHook, verify_results  # noqa: F401
from .trainer import (  # noqa: F401
    WSOVODTrainer,
    WSOVODTrainer_MixedDatasets,
    load_class_embeddings,
)

# d2-style aliases
DefaultTrainer = WSOVODTrainer
DefaultTrainer_WSOVOD = WSOVODTrainer
DefaultTrainer_WSOVOD_MixedDatasets = WSOVODTrainer_MixedDatasets


def default_writers(output_dir: str, max_iter: int | None = None):
    """CommonMetricPrinter + JSON + tensorboard (reference
    ``engine/defaults.py:47-64``)."""
    import os

    from ..utils.events import CommonMetricPrinter, JSONWriter, TensorboardWriter

    writers = [
        CommonMetricPrinter(max_iter),
        JSONWriter(os.path.join(output_dir, "metrics.json")),
    ]
    try:
        writers.append(TensorboardWriter(output_dir))
    except Exception:
        pass
    return writers
