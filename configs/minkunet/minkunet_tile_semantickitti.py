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
# (2,4,4) tiles), sized with ~15% margin. NOTE: (2,4,4) tiles on this grid
# give 400M tile-grid cells per sample — the sorted index's int32 linear
# ids cap batch_size at 5; use (4,8,8) tiles for larger training batches.
_base_ = ['./minkunet_semantickitti.py']

model = dict(
    backbone=dict(
        backend='tile',
        tile_shape=(2, 4, 4),
        tile_capacities=[28800, 16000, 8600, 4200, 2000],
    ),
)
