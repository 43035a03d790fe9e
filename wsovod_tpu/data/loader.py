"""Data loaders: dataset dicts -> padded, statically-shaped device batches.

Reference ``wsovod/data/build.py:228-538``: catalog fetch, crowd/empty
filtering, proposal-file merge, infinite shuffled training sampler (with
repeat-factor and class-aspect-grouping options) and a batch-1 inference
loader sharded across ranks. TPU adaptations: batches are grouped by padded
image bucket (instead of d2's aspect-ratio grouping — same goal: minimise
padding; here it also bounds XLA program count), and every batch is a dict of
stacked numpy arrays ready for ``jax.device_put``.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .catalog import DatasetCatalog
from .dataset_mapper import DatasetMapper
from .proposals import load_proposals_into_dataset


def get_detection_dataset_dicts(
    names: Sequence[str],
    filter_empty: bool = True,
    proposal_files: Optional[Sequence[str]] = None,
) -> List[dict]:
    if isinstance(names, str):
        names = [names]
    dicts = []
    for i, name in enumerate(names):
        d = DatasetCatalog.get(name)
        if proposal_files is not None and i < len(proposal_files) and proposal_files[i]:
            d = load_proposals_into_dataset(d, proposal_files[i])
        dicts.extend(d)
    if filter_empty:
        dicts = [
            r
            for r in dicts
            if any(not a.get("iscrowd", 0) for a in r.get("annotations", []))
        ]
    assert dicts, f"no valid records in {names}"
    return dicts


class TrainingSampler:
    """Infinite shuffled index stream (d2 TrainingSampler), per-host sharded."""

    def __init__(self, size: int, seed: int = 0, shard_rank: int = 0, num_shards: int = 1):
        self.size = size
        self.seed = seed
        self.rank = shard_rank
        self.num_shards = num_shards

    def __iter__(self) -> Iterator[int]:
        rng = np.random.RandomState(self.seed)
        while True:
            perm = rng.permutation(self.size)
            yield from perm[self.rank :: self.num_shards]


class RepeatFactorTrainingSampler(TrainingSampler):
    """Category-frequency repeat sampling (d2 RFS; used by MIXED_DATASETS
    USE_RFS). Repeat factor r(img) = max over its categories of
    max(1, sqrt(t / f(c)))."""

    def __init__(self, dataset_dicts, repeat_thresh: float, **kw):
        super().__init__(len(dataset_dicts), **kw)
        freq = defaultdict(int)
        n = len(dataset_dicts)
        for r in dataset_dicts:
            for c in {a["category_id"] for a in r.get("annotations", [])}:
                freq[c] += 1
        cat_rep = {
            c: max(1.0, np.sqrt(repeat_thresh / (f / n))) for c, f in freq.items()
        }
        self.repeat_factors = np.array(
            [
                max(
                    [cat_rep.get(a["category_id"], 1.0) for a in r.get("annotations", [])]
                    or [1.0]
                )
                for r in dataset_dicts
            ]
        )

    def __iter__(self) -> Iterator[int]:
        rng = np.random.RandomState(self.seed)
        floors = np.floor(self.repeat_factors)
        frac = self.repeat_factors - floors
        while True:
            rounded = floors + (rng.rand(self.size) < frac)
            indices = np.repeat(np.arange(self.size), rounded.astype(int))
            rng.shuffle(indices)
            yield from indices[self.rank :: self.num_shards]


class InferenceSampler:
    """Each host/shard gets a contiguous slice (d2 InferenceSampler)."""

    def __init__(self, size: int, shard_rank: int = 0, num_shards: int = 1):
        shard_sizes = [size // num_shards + int(i < size % num_shards) for i in range(num_shards)]
        begin = sum(shard_sizes[:shard_rank])
        self.indices = list(range(begin, begin + shard_sizes[shard_rank]))

    def __iter__(self):
        return iter(self.indices)

    def __len__(self):
        return len(self.indices)


def _stack_batch(examples: List[Dict]) -> Dict[str, np.ndarray]:
    batch = {}
    for k in examples[0]:
        vals = [e[k] for e in examples]
        if isinstance(vals[0], np.ndarray):
            batch[k] = np.stack(vals)
        else:
            batch[k] = vals  # image_id / file_name lists stay host-side
    return batch


def _resolve_shard(shard_rank, num_shards):
    """Default the shard to this JAX process (multi-host data parallelism:
    each host loads its slice; reference d2 samplers shard by rank)."""
    if num_shards is None:
        import jax

        num_shards = jax.process_count()
        shard_rank = jax.process_index() if shard_rank is None else shard_rank
    return shard_rank or 0, num_shards


def build_detection_train_loader(
    cfg,
    shard_rank: int = None,
    num_shards: int = None,
    seed: int = 0,
) -> Iterator[Dict]:
    """Infinite batched iterator; batches grouped by image bucket so every
    batch has one static shape."""
    shard_rank, num_shards = _resolve_shard(shard_rank, num_shards)
    dicts = get_detection_dataset_dicts(
        cfg.DATASETS.TRAIN,
        filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS,
        proposal_files=cfg.DATASETS.PROPOSAL_FILES_TRAIN
        if cfg.MODEL.LOAD_PROPOSALS
        else None,
    )
    mapper = DatasetMapper(cfg, is_train=True)
    assert cfg.SOLVER.IMS_PER_BATCH % num_shards == 0, (
        f"SOLVER.IMS_PER_BATCH={cfg.SOLVER.IMS_PER_BATCH} must divide evenly "
        f"across {num_shards} hosts (silent flooring would desync the LR "
        "scaling from the effective global batch)"
    )
    batch_size = cfg.SOLVER.IMS_PER_BATCH // num_shards
    assert batch_size >= 1
    if num_shards > 1:
        # Multi-process SPMD: every host must emit the SAME batch shape each
        # step (host_local_array_to_global_array + the jitted step require
        # identical global shapes on all processes). Per-host bucket grouping
        # would diverge, so collapse to the single largest bucket.
        mapper.buckets = [max(mapper.buckets, key=lambda b: b[0] * b[1])]
    if cfg.DATALOADER.SAMPLER_TRAIN == "RepeatFactorTrainingSampler":
        sampler = RepeatFactorTrainingSampler(
            dicts, cfg.DATALOADER.REPEAT_THRESHOLD, seed=seed,
            shard_rank=shard_rank, num_shards=num_shards,
        )
    else:
        sampler = TrainingSampler(
            len(dicts), seed=seed, shard_rank=shard_rank, num_shards=num_shards
        )

    class_grouping = cfg.DATALOADER.CLASS_ASPECT_RATIO_GROUPING

    def gen():
        rng = np.random.RandomState(seed + 1000 * shard_rank)
        buckets: Dict[tuple, List[Dict]] = defaultdict(list)
        for idx in sampler:
            try:
                ex = mapper(dicts[idx], rng)
            except (OSError, ValueError):
                continue
            # skip empty-target images (reference trainer.run_step:47-50)
            if not ex["gt_valid"].any():
                continue
            key = ex["images"].shape
            if class_grouping:
                # group batches by (random present class, bucket) so each
                # batch shares a class (reference ``data/common.py:20-71``
                # ClassAspectRatioGroupedDataset)
                present = np.flatnonzero(
                    np.bincount(
                        ex["gt_classes"][ex["gt_valid"]],
                        minlength=1,
                    )
                )
                cls = int(rng.choice(present)) if len(present) else -1
                key = (cls,) + key
            buckets[key].append(ex)
            if len(buckets[key]) == batch_size:
                yield _stack_batch(buckets.pop(key))

    return gen()


def build_detection_test_loader(
    cfg,
    dataset_name: str,
    batch_size: int = 1,
    shard_rank: int = None,
    num_shards: int = None,
) -> Iterator[Dict]:
    """Finite iterator over the eval split; trailing partial batches are
    padded by repeating the last example with ``batch_valid`` marking reals."""
    names = [dataset_name] if isinstance(dataset_name, str) else list(dataset_name)
    idx = (
        list(cfg.DATASETS.TEST).index(names[0])
        if names[0] in list(cfg.DATASETS.TEST)
        else None
    )
    proposal_files = None
    if cfg.MODEL.LOAD_PROPOSALS and idx is not None:
        pf = list(cfg.DATASETS.PROPOSAL_FILES_TEST)
        proposal_files = [pf[idx]] if idx < len(pf) else None
    dicts = get_detection_dataset_dicts(
        names, filter_empty=False, proposal_files=proposal_files
    )
    mapper = DatasetMapper(cfg, is_train=False)
    shard_rank, num_shards = _resolve_shard(shard_rank, num_shards)
    sampler = InferenceSampler(len(dicts), shard_rank, num_shards)

    def gen():
        buckets: Dict[tuple, List[Dict]] = defaultdict(list)
        for i in sampler:
            ex = mapper(dicts[i])
            ex["batch_valid"] = np.array(True)
            key = ex["images"].shape
            buckets[key].append(ex)
            if len(buckets[key]) == batch_size:
                yield _stack_batch(buckets.pop(key))
        for key, rest in buckets.items():
            while len(rest) < batch_size:
                pad = dict(rest[-1])
                pad["batch_valid"] = np.array(False)
                rest.append(pad)
            yield _stack_batch(rest)

    return gen()
