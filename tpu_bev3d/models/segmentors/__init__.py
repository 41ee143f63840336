from .minkunet import MinkUNet, MinkUNetBackbone
from .cylinder3d import Cylinder3D
from .pointnet2_seg import PointNet2Seg, Seg3DTTAModel

__all__ = ['MinkUNet', 'MinkUNetBackbone', 'Cylinder3D', 'PointNet2Seg',
           'Seg3DTTAModel']
