# MinkUNet34 SemanticKITTI on the TILE-SPARSE backend (sorted-key index).
# Same model/semantics as minkunet_semantickitti.py (ref config:
# configs/minkunet/minkunet34_w32_torchsparse_8xb2-laser-polar-mix-3x_
# semantickitti.py) — backend='tile' is a pure relayout (exactness-tested
# vs the flat backend, tests/test_models/test_minkunet.py).
#
# The 12.8G-cell grid (4000^2 x 800 at 0.05 m) exceeds the dense tile-grid
# slot map the detector path uses, so the segmentor tile path runs the
# 'sorted' index: a sorted active-tile-id table + searchsorted lookups —
# nothing grid-sized ever materializes (ops/tile_sparse.py).
#
# Tile capacities measured on the bench generator (120k-pt simulated scan
# -> 59.6k voxels; tiles per k2-s2 stage: 25148/13776/7032/3332/1384 with
# (2,4,4) tiles), sized with ~15% margin. Batch size is unconstrained:
# when the sorted index's int32 tile-grid ids would overflow
# (batch_size > 5 on this grid with (2,4,4) tiles), the backbone grows
# the tile shape automatically (ops/tile_sparse.py auto_tile_shape — a
# pure relayout; the capacities stay sufficient).
# Capacity overruns are visible with TPU_BEV3D_TILE_DEBUG=1 (host-prints
# any tile-table drop) — augmentations that merge two scans (LaserMix/
# PolarMix) can exceed a single-scan sizing; see tile_capacities_train.
_base_ = ['./minkunet_semantickitti.py']

model = dict(
    backbone=dict(
        backend='tile',
        tile_shape=(2, 4, 4),
        tile_capacities=[28800, 16000, 8600, 4200, 2000],
        stage_capacities=None,   # flat-backend schedule doesn't apply
    ),
)
