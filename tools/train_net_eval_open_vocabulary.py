#!/usr/bin/env python
"""Cross-dataset open-vocabulary evaluation CLI.

Mirrors reference ``tools/train_net_eval_open_vocabulary.py:45-95``: identical
to train_net but forces the OVCOCOEvaluator (48-base / 17-novel split report)
for every COCO test set, for evaluating e.g. a VOC-trained model on COCO with
a swapped CLIP classifier.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_net import default_argument_parser, main, setup  # noqa: E402


def _force_ov_evaluator():
    from wsovod_tpu.data.catalog import MetadataCatalog
    from wsovod_tpu.data.datasets.builtin import register_all

    register_all()
    for name in ("coco_2017_val", "coco_2017_train"):
        MetadataCatalog.get(name).set(evaluator_type="ov_coco")


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    _force_ov_evaluator()
    main(args)
