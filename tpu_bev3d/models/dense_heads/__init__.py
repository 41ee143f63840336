from .anchor3d_head import Anchor3DHead
from .centerpoint_head import CenterHead, SeparateHead
from .transfusion_head import BEVFusionHead
from .petr_head import PETRHead
from .vote_head import VoteHead
from .fcos_mono3d_head import FCOSMono3DHead
from .fcaf3d_head import FCAF3DHead, MinkSingleStage3DDetector
from .smoke_head import SMOKEMono3DHead, SMOKEMono3D
from .free_anchor3d_head import FreeAnchor3DHead
from .point_rpn_head import PointRPNHead
from .ssd_3d_head import SSD3DHead
from .shape_aware_head import ShapeAwareHead
from .monoflex_head import MonoFlexHead, MonoFlex
from .pgd_head import PGDHead
from .groupfree3d_head import GroupFree3DHead
from .yolox_head import YOLOXHead2D

__all__ = ['Anchor3DHead', 'CenterHead', 'SeparateHead', 'BEVFusionHead',
           'PETRHead', 'VoteHead', 'FCOSMono3DHead', 'FCAF3DHead', 'MinkSingleStage3DDetector', 'SMOKEMono3DHead', 'SMOKEMono3D', 'FreeAnchor3DHead', 'PointRPNHead', 'SSD3DHead', 'ShapeAwareHead', 'MonoFlexHead', 'MonoFlex', 'PGDHead', 'GroupFree3DHead', 'YOLOXHead2D']
