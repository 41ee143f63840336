# BEVFusion L+C with the dense 3D-conv voxel encoder — the TPU-optimized
# flagship variant (see tpu_bev3d/models/middle_encoders/dense_encoder.py:
# dense MXU conv replaces the scalar-bound sparse gather path).
_base_ = './bevfusion_lidar_cam_voxel0075_second_secfpn_nus.py'

model = dict(
    compute_dtype='bfloat16',
    middle_encoder=dict(
        _delete_=True,
        type='DenseVoxelEncoder',
        in_channels=5,
        sparse_shape=[41, 1440, 1440],
        base_channels=32,
        stage_channels=[64, 128],
        output_channels=128,
        space_to_depth=True),
)
