"""StableHLO export roundtrip: serialize → reload → identical outputs."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.deploy import export_model, load_exported
from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg


def test_export_roundtrip(tmp_path):
    cfg = Config.fromfile('configs/pointpillars/pointpillars_kitti_3class.py')
    m = cfg.model
    m.voxel_size = [0.64, 0.64, 4]
    m.max_voxels = 256
    m.max_num_points = 8
    m.voxel_encoder.voxel_size = [0.64, 0.64, 4]
    m.middle_encoder.output_shape = [128, 112]
    m.bbox_head.nms_pre = 64
    m.bbox_head.max_num = 8
    model = build_detector_from_cfg(m)
    batch = create_detector_inputs(batch_size=1, num_points=256)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')

    path = export_model(model, variables, batch, str(tmp_path / 'm.hlo'))
    fn = load_exported(path)
    out = fn(batch)
    ref = model.apply(variables, batch, mode='predict')
    assert np.allclose(np.asarray(out['bboxes']), np.asarray(ref['bboxes']),
                       atol=1e-5)


def test_export_flagship_tiny_roundtrip(tmp_path):
    """The fused L+C flagship (tiny geometry) exports to StableHLO and
    reloads with identical predictions — the deploy path for the actual
    bench model family."""
    import __graft_entry__ as g
    cfg = g._flagship_cfg(tiny=True)
    model = build_detector_from_cfg(cfg.model)
    batch = g._make_batch(cfg, batch_size=1, num_points=256,
                          image_size=(64, 176))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    path = export_model(model, variables, batch,
                        str(tmp_path / 'flagship.hlo'))
    fn = load_exported(path)
    out = fn(batch)
    ref = model.apply(variables, batch, mode='predict')
    assert np.allclose(np.asarray(out['bboxes']),
                       np.asarray(ref['bboxes']), atol=1e-5)
    assert np.allclose(np.asarray(out['scores']),
                       np.asarray(ref['scores']), atol=1e-5)
