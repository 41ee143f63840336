# VoteNet ScanNet, TPU-fast serving variant (measured v5e chain,
# docs/benchmarks.md): faithful 167.5 ms → bucketed FPS 120.2 ms →
# approx ball query 7.49 ms = 133 fps (22x).
# - fps_chunks=8: bucketed subsample-union FPS in every SA stage + the
#   vote-aggregation stage. The exact FPS chain (2048+1024+512+256+256
#   sequential steps) bound the faithful config; bucketing cuts the
#   sequential dependency 8x while keeping the FPS max-min coverage
#   objective within a small factor (tests/test_ops/test_fps_bucketed.py).
# - ballq='approx': lax.approx_max_k neighbor selection (~0.95 recall).
#   The exact per-row top_k sort over the [2048, 40000] SA1 distance
#   matrix was 94% of the model's latency; the reference's own
#   ball_query contract is an ARBITRARY K-within-radius set, so a
#   0.95-recall near-neighbor set is strictly closer to "K nearest"
#   than the reference's first-K-encountered.
_base_ = './votenet_scannet.py'

model = dict(
    backbone=dict(fps_chunks=8, ballq='approx'),
    bbox_head=dict(fps_chunks=8, ballq='approx'),
)
