from .pillar_scatter import PointPillarsScatter
from .sparse_encoder import SparseEncoder, BEVFusionSparseEncoder
from .dense_encoder import DenseVoxelEncoder
from .bev_column_encoder import BEVColumnEncoder
from .sparse_unet import SparseUNet
from .voxel_set_abstraction import VoxelSetAbstraction

__all__ = ['PointPillarsScatter', 'SparseEncoder', 'BEVFusionSparseEncoder',
           'DenseVoxelEncoder', 'BEVColumnEncoder', 'SparseUNet', 'VoxelSetAbstraction']
