# nuImages 2D instance segmentation (ref family: configs/nuimages/
# mask-rcnn_*, cascade-mask-rcnn_*, htc_* — 2D detectors with instance
# masks trained on the nuimage converter's COCO RLEs). TPU analogue:
# the fixed-shape YOLOX 2D detector with a YOLACT-style prototype mask
# branch — k prototypes from the stride-8 level + per-prior mask
# coefficients; masks = sigmoid(protos @ coefs) cropped to boxes. The
# converter (tools/nuimages_converter.py) emits the RLEs; Pack3DDetInputs
# (mask_size) decodes them to fixed-shape per-GT binary masks.
_base_ = './yolox2d_nuimages.py'

model = dict(
    bbox_head=dict(
        mask_channels=32,
        mask_pos_topk=32,
    ),
)

# pipeline note: pack with Pack3DDetInputs(max_gt_2d=..., mask_size=(112,
# 200)) — masks train at stride-8 resolution of the 900x1600 nuImages
# frames (protos are resized to match under jit if shapes differ).
