from .bev_roi_head import BEVGridRoIHead
from .point_rcnn_roi_head import PointRCNNRoIHead
from .pv_rcnn_roi_head import PVRCNNRoIHead
from .h3d_roi_head import (H3DRoIHead, PrimitiveHead, box_primitives)
from .part_aggregation_roi_head import (PartA2RoIHead,
                                        PointwiseSemanticHead,
                                        roi_aware_pool,
                                        roi_aware_pool_pruned,
                                        roi_candidate_select)

__all__ = ['BEVGridRoIHead', 'PointRCNNRoIHead', 'PVRCNNRoIHead', 'H3DRoIHead', 'PrimitiveHead', 'PartA2RoIHead', 'PointwiseSemanticHead',
           'roi_aware_pool', 'roi_aware_pool_pruned',
           'roi_candidate_select']
