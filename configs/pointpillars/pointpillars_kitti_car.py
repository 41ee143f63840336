# PointPillars KITTI car-only (ref config:
# configs/pointpillars/pointpillars_hv_secfpn_8xb6-160e_kitti-3d-car.py —
# README.md:25 77.6 moderate AP).
_base_ = './pointpillars_kitti_3class.py'

class_names = ['Car']

model = dict(
    bbox_head=dict(
        num_classes=1,
        anchor_generator=dict(
            _delete_=True,
            type='Anchor3DRangeGenerator',
            ranges=[[0, -39.68, -1.78, 69.12, 39.68, -1.78]],
            sizes=[[3.9, 1.6, 1.56]],
            rotations=[0, 1.57]),
        assigner_cfgs=[dict(pos_iou_thr=0.6, neg_iou_thr=0.45,
                            min_pos_iou=0.45)],
    ),
)

train_cfg = dict(max_epochs=160)
