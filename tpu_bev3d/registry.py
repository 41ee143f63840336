"""Lightweight registry system.

TPU-native replacement for the reference's 21 mmengine registries
(ref: mmdet3d/registry.py:36-138). We keep the same ergonomics — string-keyed
component lookup driven by config dicts with a ``type`` field — without the
mmengine parent/scope machinery, which buys nothing in a single-package build.
"""
from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """A string -> class/function table with config-driven ``build``.

    Mirrors the slice of ``mmengine.registry.Registry`` behavior the reference
    actually uses: ``register_module`` decorator, ``get``, and ``build(cfg)``
    where ``cfg['type']`` selects the component and the remaining keys are
    kwargs (ref usage: ``MODELS.build(cfg)`` throughout mmdet3d).
    """

    def __init__(self, name: str):
        self.name = name
        self._table: Dict[str, Callable] = {}

    def register_module(self, name: Optional[str] = None, module: Optional[Callable] = None,
                        force: bool = False):
        if module is not None:
            self._register(module, name, force)
            return module

        def decorator(cls):
            self._register(cls, name, force)
            return cls

        return decorator

    def _register(self, module: Callable, name: Optional[str], force: bool):
        key = name or module.__name__
        if not force and key in self._table and self._table[key] is not module:
            raise KeyError(f'{key} already registered in {self.name}')
        self._table[key] = module

    def get(self, key: str) -> Callable:
        if key not in self._table:
            raise KeyError(
                f'{key!r} is not registered in {self.name}. '
                f'Available: {sorted(self._table)}')
        return self._table[key]

    def __contains__(self, key: str) -> bool:
        return key in self._table

    def keys(self):
        return self._table.keys()

    def build(self, cfg: Optional[dict], **default_kwargs) -> Any:
        """Instantiate from a config dict with a ``type`` key.

        ``cfg`` may also be an already-built object (passed through), matching
        mmengine's leniency. Nested dicts are NOT recursively built — components
        build their own children explicitly, keeping construction traceable.
        """
        if cfg is None:
            return None
        if not isinstance(cfg, dict):
            return cfg  # already built
        cfg = dict(cfg)
        typ = cfg.pop('type')
        cls = self.get(typ) if isinstance(typ, str) else typ
        kwargs = {**default_kwargs, **cfg}
        try:
            return cls(**kwargs)
        except TypeError as e:
            raise TypeError(f'Error building {typ} from {self.name}: {e}') from e


# The registries the TPU build actually needs (subset of the reference's 21;
# LOOPS/RUNNERS/HOOKS etc. are plain python here, not registry-driven).
MODELS = Registry('models')
DATASETS = Registry('datasets')
TRANSFORMS = Registry('transforms')
METRICS = Registry('metrics')
TASK_UTILS = Registry('task_utils')
