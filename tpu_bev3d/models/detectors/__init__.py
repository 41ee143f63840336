from .voxelnet import VoxelNet, DynamicVoxelNet
from .centerpoint import CenterPoint
from .bevfusion import BEVFusion, ConvFuser
from .petr import PETR
from .votenet import VoteNet

__all__ = ['VoxelNet', 'DynamicVoxelNet', 'CenterPoint', 'BEVFusion',
           'ConvFuser', 'PETR', 'VoteNet']
