from .voxelnet import VoxelNet, DynamicVoxelNet
from .centerpoint import CenterPoint
from .bevfusion import BEVFusion, ConvFuser

__all__ = ['VoxelNet', 'DynamicVoxelNet', 'CenterPoint', 'BEVFusion',
           'ConvFuser']
