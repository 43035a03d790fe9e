#!/usr/bin/env python
"""Single-process debug entry (reference ``tools/train_net_debug.py:82-86``):
train_net with a hardcoded config override for debugger runs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_net import default_argument_parser, main  # noqa: E402

if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    if not args.config_file:
        args.config_file = "configs/PascalVOC-Detection/WSOVOD_WSR_18_DC5_1x.yaml"
    args.opts = ["SOLVER.IMS_PER_BATCH", "2", "SOLVER.MAX_ITER", "20"] + (args.opts or [])
    main(args)
