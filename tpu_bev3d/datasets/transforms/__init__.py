from .loading import (LoadPointsFromFile, LoadPointsFromMultiSweeps,
                      LoadAnnotations3D, LoadPointsFromDict,
                      LoadImageFromFileMono3D)
from .transforms_3d import (GlobalRotScaleTrans, RandomFlip3D,
                            PointsRangeFilter, ObjectRangeFilter,
                            ObjectNameFilter, PointShuffle, PointSample,
                            ObjectSample)
from .transforms_extra import (AffineResize, RandomShiftScale, Resize3D,
                               RandomResize3D, RandomCrop3D,
                               PhotoMetricDistortion3D, MultiViewWrapper,
                               GlobalAlignment, RandomJitterPoints,
                               RandomDropPointsColor, BackgroundPointsFilter,
                               VoxelBasedPointSampler,
                               IndoorPatchPointSample, PolarMix, LaserMix,
                               PointSegClassMapping)
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
    'GridMask', 'AffineResize', 'RandomShiftScale', 'Resize3D',
    'RandomResize3D', 'RandomCrop3D', 'PhotoMetricDistortion3D',
    'MultiViewWrapper', 'GlobalAlignment', 'RandomJitterPoints',
    'RandomDropPointsColor', 'BackgroundPointsFilter',
    'VoxelBasedPointSampler', 'IndoorPatchPointSample', 'PolarMix',
    'LaserMix', 'LoadImageFromFileMono3D', 'PointSegClassMapping',
]
