# SA-SSD KITTI 3-class (ref: mmdet3d/models/detectors/sassd.py —
# SECOND with auxiliary point-wise foreground/center supervision).
_base_ = '../second/second_kitti_3class.py'

model = dict(
    type='SASSD',
    aux_loss_weight=1.0,
)
