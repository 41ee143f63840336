from .voxelnet import VoxelNet
from .centerpoint import CenterPoint
from .bevfusion import BEVFusion, ConvFuser

__all__ = ['VoxelNet', 'CenterPoint', 'BEVFusion', 'ConvFuser']
