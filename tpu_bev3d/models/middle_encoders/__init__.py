from .pillar_scatter import PointPillarsScatter
from .sparse_encoder import SparseEncoder, BEVFusionSparseEncoder
from .dense_encoder import DenseVoxelEncoder

__all__ = ['PointPillarsScatter', 'SparseEncoder', 'BEVFusionSparseEncoder',
           'DenseVoxelEncoder']
