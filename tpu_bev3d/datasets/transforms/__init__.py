from .loading import (LoadPointsFromFile, LoadPointsFromMultiSweeps,
                      LoadAnnotations3D, LoadPointsFromDict)
from .transforms_3d import (GlobalRotScaleTrans, RandomFlip3D,
                            PointsRangeFilter, ObjectRangeFilter,
                            ObjectNameFilter, PointShuffle, PointSample,
                            ObjectSample)
from .formating import Pack3DDetInputs
from .dbsampler import DataBaseSampler
from .image_transforms import (BEVLoadMultiViewImageFromFiles, ImageAug3D,
                               GridMask)

__all__ = [
    'LoadPointsFromFile', 'LoadPointsFromMultiSweeps', 'LoadAnnotations3D',
    'LoadPointsFromDict', 'GlobalRotScaleTrans', 'RandomFlip3D',
    'PointsRangeFilter', 'ObjectRangeFilter', 'ObjectNameFilter',
    'PointShuffle', 'PointSample', 'ObjectSample', 'Pack3DDetInputs',
    'DataBaseSampler', 'BEVLoadMultiViewImageFromFiles', 'ImageAug3D',
    'GridMask',
]
