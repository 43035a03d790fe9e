"""Multi-dataset train loader (reference ``wsovod/data/build_multi_dataset.py``).

Tags every record with ``dataset_id`` (:270-274), merges per-dataset proposal
files, and batches HOMOGENEOUSLY by (dataset_id, image bucket) with
per-dataset batch sizes from ``SOLVER.IMS_PER_BATCH_LIST`` (the reference's
``MultiDatasetAspectRatioGroupedDataset``, :540-578). Sampling follows
``MultiDatasetTrainingSampler`` (``samplers/distributed_sampler_multi_dataset.py:17-137``):
repeat factor = dataset weight ``max(sizes)/size_d * ratio_d`` times a
per-image factor (RFS category frequency, CAS class balance, or 1), with
stochastic rounding per epoch.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterator, List

import numpy as np

from .catalog import DatasetCatalog
from .dataset_mapper import DatasetMapper
from .loader import _stack_batch
from .proposals import load_proposals_into_dataset


def _rfs_factors(dicts: List[dict], repeat_thresh: float) -> np.ndarray:
    freq = defaultdict(int)
    n = len(dicts)
    for r in dicts:
        for c in {a["category_id"] for a in r.get("annotations", [])}:
            freq[c] += 1
    cat_rep = {c: max(1.0, np.sqrt(repeat_thresh / (f / n))) for c, f in freq.items()}
    return np.array(
        [
            max([cat_rep.get(a["category_id"], 1.0) for a in r.get("annotations", [])] or [1.0])
            for r in dicts
        ]
    )


def _cas_factors(dicts: List[dict], num_classes: int, lam: float) -> np.ndarray:
    """Class-aware sampling: image factor ~ sum over its classes of
    1 / freq^lambda."""
    freq = np.zeros(num_classes)
    for r in dicts:
        for c in {a["category_id"] for a in r.get("annotations", [])}:
            if c < num_classes:
                freq[c] += 1
    freq = np.maximum(freq, 1.0)
    inv = 1.0 / freq ** lam
    out = np.array(
        [
            sum(inv[a["category_id"]] for a in r.get("annotations", []) if a["category_id"] < num_classes)
            or 1.0
            for r in dicts
        ]
    )
    return out / out.mean()


class MultiDatasetTrainingSampler:
    """Infinite stream of (dataset_id, index) with dataset weighting."""

    def __init__(
        self,
        sizes: List[int],
        ratios: List[float],
        per_image_factors: List[np.ndarray],
        seed: int = 0,
        shard_rank: int = 0,
        num_shards: int = 1,
    ):
        max_size = max(sizes)
        self.repeat_factors = []
        for d, (size, ratio, pif) in enumerate(zip(sizes, ratios, per_image_factors)):
            dataset_w = max_size / size * ratio
            self.repeat_factors.append(dataset_w * pif)
        self.sizes = sizes
        self.seed = seed
        self.shard_rank = shard_rank
        self.num_shards = num_shards

    def __iter__(self) -> Iterator:
        # the seed is shared across hosts (reference shared_random_seed) so
        # every shard draws the same epoch stream and takes a disjoint slice
        rng = np.random.RandomState(self.seed)
        while True:
            pairs = []
            for d, rf in enumerate(self.repeat_factors):
                floors = np.floor(rf)
                rounded = (floors + (rng.rand(len(rf)) < (rf - floors))).astype(int)
                idxs = np.repeat(np.arange(self.sizes[d]), rounded)
                pairs.append(np.stack([np.full_like(idxs, d), idxs], 1))
            allp = np.concatenate(pairs)
            rng.shuffle(allp)
            yield from map(tuple, allp[self.shard_rank :: self.num_shards])


class MultiDatasetInferenceSampler:
    """Per-dataset contiguous shards (reference :140-176)."""

    def __init__(self, sizes: List[int], shard_rank: int = 0, num_shards: int = 1):
        self.pairs = []
        for d, size in enumerate(sizes):
            begin = size * shard_rank // num_shards
            end = size * (shard_rank + 1) // num_shards
            self.pairs.extend((d, i) for i in range(begin, end))

    def __iter__(self):
        return iter(self.pairs)


def build_multi_dataset_train_loader(cfg, seed: int = 0) -> Iterator[Dict]:
    md = cfg.DATASETS.MIXED_DATASETS
    names = list(md.NAMES)
    all_dicts = []
    for i, name in enumerate(names):
        d = DatasetCatalog.get(name)
        if cfg.MODEL.LOAD_PROPOSALS and i < len(md.PROPOSAL_FILES) and md.PROPOSAL_FILES[i]:
            d = load_proposals_into_dataset(d, md.PROPOSAL_FILES[i])
        if i < len(md.FILTER_EMPTY_ANNOTATIONS) and md.FILTER_EMPTY_ANNOTATIONS[i]:
            d = [r for r in d if any(not a.get("iscrowd", 0) for a in r.get("annotations", []))]
        for r in d:
            r = dict(r)
            r["dataset_id"] = i
        all_dicts.append([dict(r, dataset_id=i) for r in d])

    factors = []
    for i, d in enumerate(all_dicts):
        if i < len(md.USE_RFS) and md.USE_RFS[i]:
            factors.append(_rfs_factors(d, md.REPEAT_THRESHOLD))
        elif i < len(md.USE_CAS) and md.USE_CAS[i]:
            factors.append(_cas_factors(d, md.NUM_CLASSES[i], md.CAS_LAMBDA))
        else:
            factors.append(np.ones(len(d)))

    from .loader import _resolve_shard

    shard_rank, num_shards = _resolve_shard(None, None)
    sampler = MultiDatasetTrainingSampler(
        [len(d) for d in all_dicts], list(md.RATIOS), factors, seed=seed,
        shard_rank=shard_rank, num_shards=num_shards,
    )
    mapper = DatasetMapper(cfg, is_train=True)
    for b in cfg.SOLVER.IMS_PER_BATCH_LIST:
        assert b % num_shards == 0, (
            f"IMS_PER_BATCH_LIST entry {b} must divide evenly across "
            f"{num_shards} hosts (silent flooring would desync LR scaling)"
        )
    if num_shards > 1:
        # identical per-step batch shapes on every host (see loader.py)
        mapper.buckets = [max(mapper.buckets, key=lambda b: b[0] * b[1])]
    batch_sizes = [b // num_shards for b in cfg.SOLVER.IMS_PER_BATCH_LIST]
    while len(batch_sizes) < len(names):
        batch_sizes.append(batch_sizes[-1])

    def gen():
        rng = np.random.RandomState(seed + 7)
        buckets: Dict[tuple, List[Dict]] = defaultdict(list)
        for d, idx in sampler:
            try:
                ex = mapper(all_dicts[d][idx], rng)
            except (OSError, ValueError):
                continue
            if not ex["gt_valid"].any():
                continue
            ex["dataset_id"] = np.array(d, np.int32)
            key = (d, ex["images"].shape)
            buckets[key].append(ex)
            if len(buckets[key]) == batch_sizes[d]:
                batch = _stack_batch(buckets.pop(key))
                yield batch

    return gen()
