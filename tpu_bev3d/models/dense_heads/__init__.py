from .anchor3d_head import Anchor3DHead
from .centerpoint_head import CenterHead, SeparateHead

__all__ = ['Anchor3DHead', 'CenterHead', 'SeparateHead']
