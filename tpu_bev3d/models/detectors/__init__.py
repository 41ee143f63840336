from .voxelnet import VoxelNet
from .centerpoint import CenterPoint

__all__ = ['VoxelNet', 'CenterPoint']
