from .anchor_generator import (Anchor3DRangeGenerator,
                               AlignedAnchor3DRangeGenerator)
from .coders import DeltaXYZWLHRBBoxCoder, CenterPointBBoxCoder
from .assigners import max_iou_assign
from .samplers import IoUNegPiecewiseSampler
from .mono_coders import (SMOKECoder, MonoFlexCoder, FCOS3DBBoxCoder)

__all__ = [
    'Anchor3DRangeGenerator', 'AlignedAnchor3DRangeGenerator',
    'DeltaXYZWLHRBBoxCoder', 'CenterPointBBoxCoder', 'max_iou_assign',
    'IoUNegPiecewiseSampler', 'SMOKECoder', 'MonoFlexCoder',
    'FCOS3DBBoxCoder',
]
