# nuImages 2D detection (ref family: configs/nuimages/* — the reference
# trains mmdet cascade-mask-rcnn/htc 2D models on the nuimages converter
# output; this repo's 2D surface is the fixed-shape YOLOX head used for
# StreamPETR's auxiliary 2D supervision, so the nuimages family resolves
# to a single-view YOLOX 2D detector over the same converter pkls
# (tools/nuimages_converter.py). Instance masks: the converter emits the
# reference's COCO RLEs and mask_channels>0 trains a YOLACT-style
# prototype mask branch on them (see yolox2d_mask_nuimages.py).
class_names = [
    'car', 'truck', 'trailer', 'bus', 'construction_vehicle', 'bicycle',
    'motorcycle', 'pedestrian', 'traffic_cone', 'barrier'
]

model = dict(
    type='YOLOX2DDetector',
    backbone=dict(
        type='SwinTransformer',
        embed_dims=96,
        depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24],
        window_size=8,
        out_indices=[1, 2, 3]),
    neck=dict(
        type='FPN',
        in_channels=[192, 384, 768],
        out_channels=128,
        num_outs=3),
    bbox_head=dict(
        type='YOLOXHead2D',
        num_classes=10,
        in_channels=128,
        feat_channels=128,
        strides=[8, 16, 32]),
)

train_cfg = dict(
    max_epochs=12,
    optimizer=dict(type='adamw', lr=1e-4, weight_decay=0.05),
    scheduler=dict(type='cosine', min_lr_ratio=0.01),
    clip_grad_norm=35.0,
    batch_size=16,
)

data_root = 'data/nuimages/'
