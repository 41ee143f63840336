# MinkUNet34 tile backend with bfloat16 tile GEMMs (serving-precision
# variant). Same relayout/semantics as minkunet_tile_semantickitti.py;
# the conv GEMMs (subm / strided / inverse — compute_dtype is threaded
# through every SparseConvLayer, SparseBasicBlock and
# SparseInverseConvLayer as of r5) accumulate in bf16 on the MXU while
# BN/softmax stay f32. A/B'd against the f32 tile row in
# docs/benchmarks.md (TILE-SHAPE SWEEP / segmentor rows).
_base_ = ['./minkunet_tile_semantickitti.py']

model = dict(backbone=dict(tile_dtype='bfloat16'))
