"""Multi-host utilities (single-process degenerate paths + shard math).

True multi-process behavior needs a real slice; these tests pin the
world-of-1 semantics every call site relies on, plus the host-sharding
arithmetic of the samplers (disjoint, exhaustive shards).
"""

import numpy as np

from wsovod_tpu.parallel.distributed import (
    all_gather_objects,
    gather_to_main,
    initialize_from_args,
    is_main_process,
    process_count,
    process_index,
    synchronize,
)


def test_single_process_degenerate():
    assert process_count() == 1 and process_index() == 0
    assert is_main_process()
    synchronize("test")  # no-op
    initialize_from_args(1, 0, "auto")  # no-op without a cluster
    obj = {"a": np.arange(3), "b": "x"}
    out = all_gather_objects(obj)
    assert len(out) == 1 and out[0]["b"] == "x"
    assert gather_to_main([1, 2]) == [[1, 2]]


def test_inference_sampler_shards_disjoint_exhaustive():
    from wsovod_tpu.data.loader import InferenceSampler

    n, shards = 23, 4
    seen = []
    for r in range(shards):
        seen += list(InferenceSampler(n, r, shards))
    assert sorted(seen) == list(range(n))


def test_training_sampler_shards_disjoint():
    from wsovod_tpu.data.loader import TrainingSampler

    import itertools

    n, shards = 16, 2
    streams = [
        list(itertools.islice(iter(TrainingSampler(n, seed=3, shard_rank=r, num_shards=shards)), n // shards))
        for r in range(shards)
    ]
    # one epoch across both shards covers every index exactly once
    assert sorted(streams[0] + streams[1]) == list(range(n))


def test_multi_dataset_sampler_shards_disjoint():
    from wsovod_tpu.data.loader_multi_dataset import MultiDatasetTrainingSampler

    import itertools

    sizes = [6, 4]
    factors = [np.ones(6), np.ones(4)]
    full = list(
        itertools.islice(
            iter(MultiDatasetTrainingSampler(sizes, [1.0, 1.0], factors, seed=5)), 12
        )
    )
    s0 = list(
        itertools.islice(
            iter(
                MultiDatasetTrainingSampler(
                    sizes, [1.0, 1.0], factors, seed=5, shard_rank=0, num_shards=2
                )
            ),
            6,
        )
    )
    s1 = list(
        itertools.islice(
            iter(
                MultiDatasetTrainingSampler(
                    sizes, [1.0, 1.0], factors, seed=5, shard_rank=1, num_shards=2
                )
            ),
            6,
        )
    )
    assert s0 == full[0::2] and s1 == full[1::2]


def test_evaluator_gather_noop_world1():
    from wsovod_tpu.data.catalog import MetadataCatalog
    from wsovod_tpu.evaluation.coco_evaluation import COCOEvaluator

    MetadataCatalog.get("_dist_eval_test").set(
        thing_classes=["a"], evaluator_type="coco"
    )
    ev = COCOEvaluator("_dist_eval_test")
    ev.process_gt(1, np.array([[0.0, 0.0, 10.0, 10.0]]), np.array([0]))
    ev.process(1, np.array([[0.0, 0.0, 10.0, 10.0]]), np.array([0.9]), np.array([0]))
    res = ev.evaluate()
    assert abs(res["bbox"]["AP50"] - 100.0) < 1e-6
