from .voxel_encoder import HardSimpleVFE, DynamicSimpleVFE, DynamicVFE
from .pillar_encoder import PillarFeatureNet

__all__ = ['HardSimpleVFE', 'DynamicSimpleVFE', 'DynamicVFE',
           'PillarFeatureNet']
