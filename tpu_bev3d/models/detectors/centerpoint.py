"""CenterPoint detector (ref: mmdet3d/models/detectors/centerpoint.py:9 —
structurally identical to VoxelNet but with SparseEncoder middle + CenterHead;
the reference subclasses MVXTwoStageDetector with empty img branch)."""
from __future__ import annotations

from ...registry import MODELS
from .voxelnet import VoxelNet


@MODELS.register_module()
class CenterPoint(VoxelNet):
    pass
