# PointPillars + NoStemRegNet-400MF backbone, nuScenes (ref config:
# configs/regnet/pointpillars_hv_regnet-400mf_secfpn_sbn-all_8xb4-2x_
# nus-3d.py — RegNetX-400MF stage plan w/o the stride-2 stem, stage
# channels (64, 160, 384)).
_base_ = '../pointpillars/pointpillars_nus.py'

model = dict(
    backbone=dict(
        _delete_=True,
        type='NoStemRegNet',
        in_channels=64,
        stage_channels=(64, 160, 384),
        stage_blocks=(1, 4, 7),
        stage_strides=(1, 2, 2),
        group_width=16,
        out_indices=(0, 1, 2)),
    neck=dict(in_channels=[64, 160, 384]),
)
