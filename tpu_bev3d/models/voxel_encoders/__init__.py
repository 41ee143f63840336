from .voxel_encoder import HardSimpleVFE, DynamicSimpleVFE
from .pillar_encoder import PillarFeatureNet

__all__ = ['HardSimpleVFE', 'DynamicSimpleVFE', 'PillarFeatureNet']
