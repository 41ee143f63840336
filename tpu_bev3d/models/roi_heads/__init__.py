from .bev_roi_head import BEVGridRoIHead
from .point_rcnn_roi_head import PointRCNNRoIHead
from .pv_rcnn_roi_head import PVRCNNRoIHead
from .part_aggregation_roi_head import (PartA2RoIHead,
                                        PointwiseSemanticHead,
                                        roi_aware_pool)

__all__ = ['BEVGridRoIHead', 'PointRCNNRoIHead', 'PVRCNNRoIHead', 'PartA2RoIHead', 'PointwiseSemanticHead',
           'roi_aware_pool']
