from .bev_pool import bev_pool, bev_pool_ranks
from .ms_deform_attn import ms_deform_attn
from .iou3d import (aligned_iou_bev, iou_3d, rotated_iou_bev,
                    rotated_overlaps_bev, xywhr2xyxyr)
from .nms import (aligned_3d_nms_mask, box3d_multiclass_nms, circle_nms_mask,
                  nms_bev_mask, nms_normal_bev_mask)
from .scatter import pillar_scatter, voxel_scatter_dense
from .sparse_conv import SparseTensor, sparse_conv3d, subm_conv3d
from .voxelize import (batch_hard_voxelize, compute_voxel_coords,
                       dynamic_scatter, dynamic_voxelize, grid_shape_of,
                       hard_voxelize)

__all__ = [
    'bev_pool', 'bev_pool_ranks', 'ms_deform_attn', 'aligned_iou_bev', 'iou_3d',
    'rotated_iou_bev', 'rotated_overlaps_bev', 'xywhr2xyxyr',
    'aligned_3d_nms_mask', 'box3d_multiclass_nms', 'circle_nms_mask',
    'nms_bev_mask', 'nms_normal_bev_mask', 'pillar_scatter',
    'voxel_scatter_dense', 'SparseTensor', 'sparse_conv3d', 'subm_conv3d',
    'batch_hard_voxelize', 'compute_voxel_coords', 'dynamic_scatter',
    'dynamic_voxelize', 'grid_shape_of', 'hard_voxelize',
]
