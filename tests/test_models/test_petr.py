"""PETR camera-only end-to-end on tiny shapes."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.testing import (build_detector_from_cfg,
                               create_multimodal_inputs)


def test_petr_loss_and_predict():
    cfg = Config.fromfile('configs/petr/petr_swin_nus.py')
    m = cfg.model
    m.image_size = [64, 176]
    m.bbox_head.num_query = 32
    m.bbox_head.num_layers = 2
    m.bbox_head.depth_num = 8
    m.bbox_head.max_num = 16
    model = build_detector_from_cfg(m)
    batch = create_multimodal_inputs(batch_size=1, num_points=64,
                                     image_size=(64, 176), num_cams=2,
                                     pc_range=(-51.2, -51.2, -5.0,
                                               51.2, 51.2, 3.0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    # aux losses for every decoder layer
    assert 'loss_cls' in losses and 'loss_cls.d0' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (1, 16, 9)
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))
