from .bev_roi_head import BEVGridRoIHead
from .part_aggregation_roi_head import (PartA2RoIHead,
                                        PointwiseSemanticHead,
                                        roi_aware_pool)

__all__ = ['BEVGridRoIHead', 'PartA2RoIHead', 'PointwiseSemanticHead',
           'roi_aware_pool']
