from .second import SECOND
from .swin import SwinTransformer
from .pointnet2_sa_ssg import PointNet2SASSG

__all__ = ['SECOND', 'SwinTransformer', 'PointNet2SASSG']
