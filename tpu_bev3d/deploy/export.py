"""Deployment export: serialize the jitted inference graph.

TPU-native analogue of the reference's ONNX/TensorRT export
(ref: projects/BEVFusion/deploy/export.py — RewriterContext + ONNX of
``_forward``; the inference-graph-only contract with fixed shapes is the
same, the artifact is StableHLO via ``jax.export`` instead of ONNX).
The exported artifact is backend-portable (CPU/TPU) and reloadable
without the model code.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def export_model(model, variables, example_batch, out_path: str) -> str:
    """Serialize ``model.apply(variables, batch, mode='predict')`` closed
    over the weights to a StableHLO artifact at ``out_path``."""
    import jax
    from jax import export as jexport

    def fn(batch):
        return model.apply(variables, batch, mode='predict', train=False)

    exported = jexport.export(jax.jit(fn))(example_batch)
    data = exported.serialize()
    with open(out_path, 'wb') as f:
        f.write(data)
    return out_path


def load_exported(path: str):
    """Load a serialized artifact → callable(batch) → predictions."""
    from jax import export as jexport
    with open(path, 'rb') as f:
        exported = jexport.deserialize(f.read())
    return exported.call
