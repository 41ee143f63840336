from .losses import (FocalLoss, GaussianFocalLoss, SmoothL1Loss, L1Loss,
                     CrossEntropyLoss, RotatedIoULoss, AxisAlignedIoULoss,
                     UncertainSmoothL1Loss, sigmoid_focal_loss,
                     gaussian_focal_loss, smooth_l1_loss, l1_loss,
                     binary_cross_entropy_with_logits,
                     softmax_cross_entropy, chamfer_distance)

__all__ = [
    'FocalLoss', 'GaussianFocalLoss', 'SmoothL1Loss', 'L1Loss',
    'CrossEntropyLoss', 'RotatedIoULoss', 'AxisAlignedIoULoss',
    'UncertainSmoothL1Loss', 'sigmoid_focal_loss', 'gaussian_focal_loss',
    'smooth_l1_loss', 'l1_loss', 'binary_cross_entropy_with_logits',
    'softmax_cross_entropy', 'chamfer_distance',
]
