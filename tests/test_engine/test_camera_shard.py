"""Camera-axis model parallelism: sharded predict is exact vs one device.

The tiny L+C flagship runs predict with the 6 camera views split over a
2-device 'cam' mesh (tpu_bev3d/parallel/camera_shard.py — pure sharding
annotations, XLA SPMD inserts the BEV-scatter reduction) and must agree
with the unsharded single-device graph.
"""
import numpy as np

import jax
from jax.sharding import Mesh

from tpu_bev3d.testing import build_detector_from_cfg


def test_cam_sharded_predict_matches_single_device():
    devs = jax.devices()
    assert len(devs) >= 2
    import __graft_entry__ as g
    cfg = g._flagship_cfg(tiny=True)
    model = build_detector_from_cfg(cfg.model)
    batch = g._make_batch(cfg, batch_size=1, num_points=256,
                          image_size=(64, 176))
    variables = jax.jit(
        lambda r, b: model.init(r, b, mode='tensor'))(
            jax.random.PRNGKey(0), batch)

    ref = model.apply(variables, batch, mode='predict')

    from tpu_bev3d.parallel import predict_cam_sharded
    mesh = Mesh(np.asarray(devs[:2]), ('cam',))
    out = predict_cam_sharded(model, mesh)(variables, batch)

    # identical ranking/labels; box/score values to f32-accumulation tol
    np.testing.assert_allclose(np.asarray(out['scores']),
                               np.asarray(ref['scores']),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['bboxes']),
                               np.asarray(ref['bboxes']),
                               rtol=1e-4, atol=1e-4)
    # labels: positional equality can flake when near-tied scores reorder
    # at the top-k/NMS boundary under a different f32 accumulation order —
    # sort-match (rounded score, label) pairs instead so ties canonicalize
    def canon(scores, labels):
        s = np.round(np.asarray(scores).ravel(), 3)
        l = np.asarray(labels).ravel()
        order = np.lexsort((l, s))
        return l[order]

    np.testing.assert_array_equal(canon(out['scores'], out['labels']),
                                  canon(ref['scores'], ref['labels']))
