"""Static-shape ``Instances``: the TPU-native replacement for detectron2's
ragged ``Instances`` structure.

Detectron2 keeps per-image Python lists of variable-length tensors; XLA needs
static shapes, so here every per-image instance set is a fixed-capacity,
padded table: a dict of arrays whose leading dim is the capacity ``N``, plus a
boolean ``valid`` mask. Batch-of-images becomes a leading batch axis via vmap
— the structure is a registered pytree, so it passes transparently through
jit/vmap/pjit.

Concatenation (e.g. fusing RPN + SAM proposals, reference
``rcnn_wsovod.py:185-204``) concatenates the padded tables and masks; there is
no compaction — downstream ops are mask-aware instead.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class Instances:
    """A fixed-capacity set of instances: dict of arrays + validity mask.

    All field arrays share leading dimension(s); ``valid`` is a boolean array
    of those leading dims. Fields are accessed as attributes.
    """

    def __init__(self, valid: jnp.ndarray, **fields: Any):
        object.__setattr__(self, "_fields", dict(fields))
        object.__setattr__(self, "valid", valid)

    # -- pytree protocol --------------------------------------------------
    def tree_flatten(self):
        keys = sorted(self._fields.keys())
        children = [self.valid] + [self._fields[k] for k in keys]
        return children, tuple(keys)

    @classmethod
    def tree_unflatten(cls, keys, children):
        valid, *vals = children
        return cls(valid, **dict(zip(keys, vals)))

    # -- dict-like --------------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        fields = object.__getattribute__(self, "_fields")
        if name in fields:
            return fields[name]
        raise AttributeError(f"Instances has no field '{name}'; has {sorted(fields)}")

    def __setattr__(self, name, value):
        raise AttributeError("Instances is immutable; use .replace()/.set()")

    def has(self, name: str) -> bool:
        return name in self._fields

    def get(self, name: str, default: Any = None) -> Any:
        return self._fields.get(name, default)

    def fields(self) -> Dict[str, Any]:
        return dict(self._fields)

    def __iter__(self) -> Iterator[str]:
        return iter(self._fields)

    def set(self, name: str, value: Any) -> "Instances":
        new = dict(self._fields)
        new[name] = value
        return Instances(self.valid, **new)

    def replace(self, **updates: Any) -> "Instances":
        new = dict(self._fields)
        valid = updates.pop("valid", self.valid)
        new.update(updates)
        return Instances(valid, **new)

    def drop(self, *names: str) -> "Instances":
        new = {k: v for k, v in self._fields.items() if k not in names}
        return Instances(self.valid, **new)

    @property
    def capacity(self) -> int:
        return self.valid.shape[-1]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def __repr__(self) -> str:
        fs = ", ".join(
            f"{k}:{tuple(v.shape) if hasattr(v, 'shape') else v}"
            for k, v in sorted(self._fields.items())
        )
        return f"Instances(valid:{tuple(self.valid.shape)}, {fs})"


def cat_instances(*instances: Instances) -> Instances:
    """Concatenate along the instance (last valid) axis. Shared fields only."""
    assert len(instances) > 0
    keys = set(instances[0]._fields.keys())
    for ins in instances[1:]:
        keys &= set(ins._fields.keys())
    axis = instances[0].valid.ndim - 1
    valid = jnp.concatenate([i.valid for i in instances], axis=axis)
    fields = {
        k: jnp.concatenate([i._fields[k] for i in instances], axis=axis)
        for k in sorted(keys)
    }
    return Instances(valid, **fields)


def pad_instances(ins: Instances, capacity: int) -> Instances:
    """Pad (or truncate) the instance axis to ``capacity``."""
    axis = ins.valid.ndim - 1
    cur = ins.valid.shape[axis]
    if cur == capacity:
        return ins

    def _fix(x, fill=0):
        if cur > capacity:
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(0, capacity)
            return x[tuple(idx)]
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, capacity - cur)
        return jnp.pad(x, pad, constant_values=fill)

    valid = _fix(ins.valid, False)
    fields = {k: _fix(v) for k, v in ins._fields.items()}
    return Instances(valid, **fields)


def masked_topk_instances(ins: Instances, scores: jnp.ndarray, k: int) -> Instances:
    """Keep the top-k highest-scoring *valid* instances (invalid score -inf);
    result is a new Instances of capacity k (padded with invalids)."""
    neg = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(ins.valid, scores, neg)
    _, idx = jax.lax.top_k(s, k)
    take = lambda x: jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - idx.ndim)), axis=ins.valid.ndim - 1
    ) if x.ndim > idx.ndim else jnp.take_along_axis(x, idx, axis=ins.valid.ndim - 1)
    valid = take(ins.valid)
    fields = {k_: take(v) for k_, v in ins._fields.items()}
    return Instances(valid, **fields)
