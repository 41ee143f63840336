from .minkunet import MinkUNet, MinkUNetBackbone
from .cylinder3d import Cylinder3D

__all__ = ['MinkUNet', 'MinkUNetBackbone', 'Cylinder3D']
