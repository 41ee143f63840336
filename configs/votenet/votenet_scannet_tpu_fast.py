# VoteNet ScanNet, TPU-fast serving variant: bucketed subsample-union
# FPS (fps_chunks=8) in every SA stage + the vote-aggregation stage.
# The exact FPS chain (2048+1024+512+256+256 sequential steps) is the
# latency bound of the faithful config (docs/benchmarks.md zoo table);
# bucketing cuts the sequential dependency 8x while keeping the FPS
# max-min coverage objective within a small factor (A/B-tested in
# tests/test_ops/test_pointnet_ops.py).
_base_ = './votenet_scannet.py'

model = dict(
    backbone=dict(fps_chunks=8),
    bbox_head=dict(fps_chunks=8),
)
