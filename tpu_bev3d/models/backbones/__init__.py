from .second import SECOND
from .swin import SwinTransformer
from .pointnet2_sa_ssg import PointNet2SASSG
from .vovnet import VoVNetCP
from .pointnet2_sa_msg import PointNet2SAMSG
from .dgcnn import DGCNNBackbone
from .dla import DLA
from .regnet import NoStemRegNet, MultiBackbone
from .spvcnn import SPVCNNBackbone

__all__ = ['SECOND', 'SwinTransformer', 'PointNet2SASSG', 'VoVNetCP',
           'PointNet2SAMSG', 'DGCNNBackbone', 'DLA', 'NoStemRegNet', 'MultiBackbone',
           'SPVCNNBackbone']
