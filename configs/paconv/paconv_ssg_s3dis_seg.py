# PAConv SSG S3DIS segmentation (ref config:
# configs/paconv/paconv_ssg_8xb8-cosine-150e_s3dis-seg.py — PointNet2
# with PAConvSAModule position-adaptive convolutions).
_base_ = '../pointnet2/pointnet2_ssg_s3dis_seg.py'

model = dict(
    backbone=dict(
        sa_module='paconv',
        paconv_kernels=16,
        sa_channels=((32, 32, 64), (64, 64, 128), (128, 128, 256),
                     (256, 256, 512))),
)
