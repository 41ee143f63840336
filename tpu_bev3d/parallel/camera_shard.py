"""Camera-axis model parallelism for multi-view predict.

Serving-latency parallelism for the L+C flagship: the camera branch
(Swin -> neck -> depthnet -> lift) is embarrassingly parallel over the
N camera views, so a frame's latency can be cut by sharding the view
axis over chips — lidar branch and head replicated, each device lifting
its own cameras into a partial BEV canvas that the (additive) bev_pool
scatter reduces across devices. The reference has no analogue (its
multi-GPU path is data-parallel training only, tools/dist_train.sh);
this is the TPU-native latency story for a fixed 6-camera rig on a
2/3/6-chip serving slice.

Implementation is pure sharding annotation: `predict_cam_sharded` jits
the model's predict with every [B, N, ...] camera leaf placed
`P(None, 'cam')` on the mesh and outputs replicated. XLA's SPMD
partitioner propagates the view-axis sharding through the reshape to
(B*N, H, W, C), the backbone/neck (batch-dim parallel), the per-view
frustum geometry and depth lift, and inserts the cross-device reduction
at the BEV scatter — no hand-written collectives. Exactness vs the
single-device graph is asserted in
tests/test_engine/test_camera_shard.py (f32 accumulation order at the
scatter is the only difference).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# batch keys carrying a per-camera axis at dim 1 ([B, N, ...])
_CAM_KEYS = ('imgs', 'cam2lidar', 'intrins', 'post_rots', 'post_trans',
             'lidar2img', 'camera_mask', 'geom_ranks')


def camera_batch_shardings(mesh: Mesh, batch, axis: str = 'cam'):
    """Per-leaf NamedShardings: camera leaves split on the view axis,
    everything else (points, aug matrices, ...) replicated."""
    rep = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        if (k in _CAM_KEYS and hasattr(v, 'ndim') and v.ndim >= 2
                and v.shape[1] % mesh.shape[axis] == 0):
            out[k] = NamedSharding(mesh, P(None, axis))
        else:
            out[k] = rep
    return out


def predict_cam_sharded(model, mesh: Mesh, axis: str = 'cam'):
    """Returns jitted fn(variables, batch) -> predictions with the camera
    branch sharded over `axis`. Variables and outputs are replicated."""

    def fwd(variables, batch):
        return model.apply(variables, batch, mode='predict', train=False)

    cache = {}

    def run(variables, batch):
        # one jitted executable per (tree structure, leaf shapes/dtypes)
        # signature — a later batch with the same structure but different
        # shapes (e.g. a camera axis not divisible by the mesh) must NOT
        # reuse shardings computed from the first batch. Repeated calls
        # with a fixed rig hit jax's own jit cache because the wrapper
        # identity is reused.
        def sig(v):
            return (v.shape, str(v.dtype)) if hasattr(v, 'shape') else repr(v)

        leaves, struct = jax.tree_util.tree_flatten((variables, batch))
        key = (struct, tuple(sig(v) for v in leaves))
        if key not in cache:
            shardings = camera_batch_shardings(mesh, batch, axis)
            rep = NamedSharding(mesh, P())
            cache[key] = jax.jit(
                fwd,
                in_shardings=(jax.tree_util.tree_map(lambda _: rep,
                                                     variables), shardings),
                out_shardings=rep)
        return cache[key](variables, batch)

    return run
