# Cylinder3D SemanticKITTI on the TILE-SPARSE backend (sorted-key index).
# Same semantics as cylinder3d_semantickitti.py — backend='tile' is a pure
# relayout (exactness-tested, tests/test_models/test_minkunet.py). The
# cylindrical grid packs tiles densely (probe: 30.7k voxels in 5018
# (2,4,4)-tiles = 6.1 rows/tile), so tile convs see little padding waste.
# Tile capacities from the 120k-pt bench scan (5018/1836/526/180/46 active
# tiles per stage) with ~20% margin.
_base_ = ['./cylinder3d_semantickitti.py']

model = dict(
    backbone=dict(
        backend='tile',
        tile_shape=(2, 4, 4),
        tile_capacities=[6000, 2200, 700, 256, 64],
        stage_capacities=None,   # flat-backend schedule doesn't apply
    ),
)
