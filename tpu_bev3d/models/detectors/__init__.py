from .voxelnet import VoxelNet, DynamicVoxelNet
from .centerpoint import CenterPoint
from .bevfusion import BEVFusion, ConvFuser
from .petr import PETR
from .votenet import VoteNet
from .fcos_mono3d import FCOSMono3D
from .stream_petr import StreamPETR, StreamPETRHead
from .two_stage import TwoStage3DDetector
from .parta2 import PartA2
from .point_rcnn import PointRCNN
from .pv_rcnn import PVRCNN
from .h3dnet import H3DNet
from .imvotenet import ImVoteNet, VoteFusion
from .dfm import DfM
from .sassd import SASSD
from .imvoxelnet import ImVoxelNet
from .mvxnet import MVXNet, PointFusion

__all__ = ['VoxelNet', 'DynamicVoxelNet', 'CenterPoint', 'BEVFusion',
           'ConvFuser', 'PETR', 'VoteNet', 'FCOSMono3D', 'StreamPETR', 'StreamPETRHead', 'TwoStage3DDetector', 'PartA2', 'PointRCNN', 'PVRCNN', 'H3DNet', 'ImVoteNet', 'VoteFusion', 'DfM', 'SASSD', 'ImVoxelNet', 'MVXNet', 'PointFusion', 'YOLOX2DDetector']
from .yolox2d import YOLOX2DDetector  # noqa: F401
