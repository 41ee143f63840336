# StreamPETR fully-sparse variant (ref: projects/StreamPETR RepDETR3D —
# SparseHead with MLN temporal alignment + YOLOX aux 2D supervision,
# refs sparse_head.py:29, yolox_head.py:21).
_base_ = './streampetr_nus.py'

model = dict(
    img_roi_head=dict(
        type='YOLOXHead2D',
        num_classes=10,
        in_channels=256,
        feat_channels=256,
        stacked_convs=2,
        strides=(16, 32)),
    bbox_head=dict(
        _delete_=True,  # replace the base StreamPETRHead wholesale
        type='SparseHead',
        num_classes=10,
        embed_dims=256,
        num_query=644,
        num_layers=6,
        nhead=8,
        depth_num=64,
        image_size=(320, 800),
        pc_range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]),
)
