from .pillar_scatter import PointPillarsScatter
from .sparse_encoder import SparseEncoder, BEVFusionSparseEncoder

__all__ = ['PointPillarsScatter', 'SparseEncoder', 'BEVFusionSparseEncoder']
