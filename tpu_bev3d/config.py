"""Python-file config system with ``_base_`` inheritance and CLI overrides.

TPU-native replacement for mmengine ``Config.fromfile`` as used by the
reference (ref: tools/train.py:74-81, configs use ``_base_`` inheritance and
``custom_imports``, e.g. projects/BEVFusion/configs/nuscenes/
bevfusion_lidar_voxel0075_second_secfpn_8xb4-cyclic-20e_nus-3d.py:1-3).

A config file is a plain python file; every module-level name that does not
start with '_' becomes a config key. ``_base_`` (str or list of str, paths
relative to the file) is loaded first and deep-merged under the child.
``--cfg-options a.b.c=v`` style dotted overrides are supported via
``Config.merge_from_options`` (ref: tools/train.py:44-52 DictAction).
"""
from __future__ import annotations

import ast
import copy
import importlib
import os
import runpy
from typing import Any, Dict, List, Union


class ConfigDict(dict):
    """dict with attribute access, so configs read like the reference's."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def __deepcopy__(self, memo):
        return ConfigDict({copy.deepcopy(k, memo): copy.deepcopy(v, memo)
                           for k, v in self.items()})


def _to_configdict(obj):
    if isinstance(obj, dict):
        return ConfigDict({k: _to_configdict(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_configdict(v) for v in obj)
    return obj


def _deep_merge(base: dict, child: dict) -> dict:
    """Merge child over base. ``_delete_=True`` in a child dict replaces the
    base dict wholesale (mmengine semantics)."""
    out = dict(base)
    for k, v in child.items():
        if (k in out and isinstance(out[k], dict) and isinstance(v, dict)
                and not v.get('_delete_', False)):
            out[k] = _deep_merge(out[k], v)
        else:
            if isinstance(v, dict):
                v = {kk: vv for kk, vv in v.items() if kk != '_delete_'}
            out[k] = v
    return out


class Config(ConfigDict):
    """Top-level config object."""

    @staticmethod
    def fromfile(path: Union[str, os.PathLike]) -> 'Config':
        path = os.fspath(path)
        ns = runpy.run_path(path)
        cfg = {k: v for k, v in ns.items()
               if not k.startswith('_') and not callable(v)
               and not isinstance(v, type(os))}
        bases = ns.get('_base_', [])
        if isinstance(bases, str):
            bases = [bases]
        merged: Dict[str, Any] = {}
        for b in bases:
            bpath = os.path.join(os.path.dirname(path), b)
            merged = _deep_merge(merged, Config.fromfile(bpath))
        merged = _deep_merge(merged, cfg)
        out = Config(_to_configdict(merged))
        # plugin loading, analogue of mmengine custom_imports
        ci = out.get('custom_imports', None)
        if ci:
            for mod in ci.get('imports', []):
                importlib.import_module(mod)
        return out

    @staticmethod
    def fromdict(d: dict) -> 'Config':
        return Config(_to_configdict(d))

    def merge_from_options(self, options: List[str]) -> None:
        """Apply ``key.sub=value`` overrides; values parsed as python literals
        when possible, else kept as strings."""
        for opt in options:
            key, _, raw = opt.partition('=')
            try:
                val = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                val = raw
            node = self
            parts = key.split('.')
            for p in parts[:-1]:
                if p not in node or not isinstance(node[p], dict):
                    node[p] = ConfigDict()
                node = node[p]
            node[parts[-1]] = _to_configdict(val)

    def copy(self) -> 'Config':
        return Config(copy.deepcopy(dict(self)))
