# MinkUNet34 tile backend, TRAINING capacities for the laser/polar-mix
# recipe (advisor r4 medium): LaserMix/PolarMix merge TWO scans, and the
# serving caps in minkunet_tile_semantickitti.py (sized from one scan)
# silently drop ~25% of stage-0..3 tiles on a mixed batch.
# Measured mixed-2-scan demand (tools probe, 2x120k-pt simulated scans →
# 101k voxels capped at max_voxels=120k): tiles/stage
# 38359/21333/10879/4850/1882 with (2,4,4) tiles; caps below carry ~15%
# margin. Use THIS config to train with mix augmentations; serve with
# the base tile config. Overruns are visible with TPU_BEV3D_TILE_DEBUG=1.
_base_ = ['./minkunet_tile_semantickitti.py']

model = dict(
    backbone=dict(
        tile_capacities=[44000, 24800, 12800, 5600, 2200],
    ),
)
