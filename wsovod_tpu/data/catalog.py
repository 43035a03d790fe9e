"""Dataset & metadata catalogs (replaces d2's global registries with an
explicit, import-light pair of dicts)."""

from __future__ import annotations

from typing import Any, Callable, Dict, List


class _DatasetCatalog:
    def __init__(self):
        self._registry: Dict[str, Callable[[], List[dict]]] = {}

    def register(self, name: str, fn: Callable[[], List[dict]]):
        if name in self._registry:
            raise KeyError(f"dataset {name} already registered")
        self._registry[name] = fn

    def get(self, name: str) -> List[dict]:
        if name not in self._registry:
            raise KeyError(
                f"dataset '{name}' not registered; known: {sorted(self._registry)}"
            )
        return self._registry[name]()

    def list(self):
        return sorted(self._registry)

    def remove(self, name: str):
        self._registry.pop(name, None)

    def clear(self):
        self._registry.clear()


class _Metadata:
    def __init__(self, name: str):
        self.name = name

    def set(self, **kwargs) -> "_Metadata":
        for k, v in kwargs.items():
            setattr(self, k, v)
        return self

    def get(self, key: str, default: Any = None) -> Any:
        return getattr(self, key, default)


class _MetadataCatalog:
    def __init__(self):
        self._store: Dict[str, _Metadata] = {}

    def get(self, name: str) -> _Metadata:
        if name not in self._store:
            self._store[name] = _Metadata(name)
        return self._store[name]

    def list(self):
        return sorted(self._store)


DatasetCatalog = _DatasetCatalog()
MetadataCatalog = _MetadataCatalog()
