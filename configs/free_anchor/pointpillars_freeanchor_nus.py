# FreeAnchor PointPillars nuScenes (ref config:
# configs/free_anchor/pointpillars_hv_regnet-1.6gf_fpn_head-free-anchor...
# — learning-to-match anchor assignment over the PointPillars trunk).
_base_ = '../pointpillars/pointpillars_nus.py'

model = dict(
    bbox_head=dict(
        _delete_=True,
        type='FreeAnchor3DHead',
        num_classes=10,
        in_channels=384,
        feat_channels=384,
        pre_anchor_topk=25,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGenerator',
            ranges=[[-50, -50, -1.8, 50, 50, -1.8]],
            sizes=[[4.60718145, 1.95017717, 1.72270761],
                   [6.73778078, 2.45609390, 2.73004906],
                   [12.01320693, 2.87427237, 3.81509561],
                   [11.1885991, 2.94046906, 3.47030982],
                   [6.38352896, 2.73050468, 3.13312415],
                   [1.68452161, 0.60058911, 1.27192197],
                   [2.09973778, 0.76279481, 1.44403034],
                   [0.72564370, 0.66344886, 1.75748069],
                   [0.40359262, 0.39694519, 1.06232151],
                   [0.48578221, 2.49008838, 0.98297065]],
            rotations=[0, 1.57]),
    ),
)
